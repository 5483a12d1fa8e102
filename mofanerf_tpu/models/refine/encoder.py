"""pix2pixHD instance-wise feature encoder.

Parity with the reference `Encoder` (tools/refine_mod/models/networks.py
define_G 'encoder' branch): conv-down / conv-up feature autoencoder whose
output is average-pooled per instance-mask region at inference. The
shipped MoFaNeRF refineNet config doesn't enable it (label_nc=0, no
instance maps), but it is part of the subsystem's public surface.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mofanerf_tpu.models.refine.generator import InstanceNorm, _reflect_pad


class InstanceFeatureEncoder(nn.Module):
    feat_nc: int = 3
    ngf: int = 16
    n_downsampling: int = 4

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] -> per-pixel feature map [B, H, W, feat_nc]."""
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID")(h)
        h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))(h)
            h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME")(h)
            h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.feat_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


def instance_average(features: jnp.ndarray, inst_map: jnp.ndarray) -> jnp.ndarray:
    """Replace each instance region's features by their region mean
    (networks.py Encoder.forward's instance-wise average pooling).

    features: [B, H, W, C]; inst_map: [B, H, W] int instance ids.
    Vectorized with segment sums — no per-instance Python loop."""
    import jax

    B, H, W, C = features.shape
    out = []
    for b in range(B):  # batch loop fine: B is tiny (1-2) in this pipeline
        ids = inst_map[b].reshape(-1)
        n_seg = 256  # instance ids are uint8-like in pix2pixHD
        feats = features[b].reshape(-1, C)
        sums = jax.ops.segment_sum(feats, ids, num_segments=n_seg)
        counts = jax.ops.segment_sum(jnp.ones((ids.shape[0], 1)), ids, num_segments=n_seg)
        means = sums / jnp.maximum(counts, 1.0)
        out.append(means[ids].reshape(H, W, C))
    return jnp.stack(out)
