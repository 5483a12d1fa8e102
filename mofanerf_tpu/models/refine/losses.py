"""RefineNet GAN losses.

Parity with tools/refine_mod/models/networks.py:75-132,417-447:
- LSGAN loss (MSE against 1/0 targets),
- multiscale feature-matching loss (L1 over D's intermediate features,
  averaged with the reference's 4/n_layers * 1/num_D weights),
- VGG19 perceptual loss over 5 slices with weights [1/32,1/16,1/8,1/4,1].

The VGG19 feature extractor is a Flax reimplementation; torchvision's
pretrained weights are NOT vendored (zero-egress environment). Pass a
weight pytree converted via `convert_torchvision_vgg19` when available;
otherwise the perceptual term can be disabled (weight 0) or used with
random features (a weaker but non-degenerate perceptual signal).
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


def lsgan_loss(logits: List[List[jnp.ndarray]], is_real: bool) -> jnp.ndarray:
    """MSE-to-target over each scale's patch logits, SUMMED across scales
    (networks.py:108-113 accumulates without averaging)."""
    target = 1.0 if is_real else 0.0
    return sum(jnp.mean((feats[-1] - target) ** 2) for feats in logits)


def feature_matching_loss(
    fake_feats: List[List[jnp.ndarray]],
    real_feats: List[List[jnp.ndarray]],
    n_layers: int = 3,
    num_D: int = 2,
) -> jnp.ndarray:
    """L1 between D features of fake and (stop-gradient) real
    (pix2pixHD_model.py loss_G_GAN_Feat)."""
    import jax

    feat_weights = 4.0 / (n_layers + 1)
    d_weights = 1.0 / num_D
    loss = 0.0
    for scale_f, scale_r in zip(fake_feats, real_feats):
        for f, r in zip(scale_f[:-1], scale_r[:-1]):
            loss = loss + feat_weights * d_weights * jnp.mean(
                jnp.abs(f - jax.lax.stop_gradient(r))
            )
    return loss


# VGG19 feature plan (torchvision layout): (channels, convs) per block.
_VGG_PLAN = [
    (64, 2), (128, 2), (256, 4), (512, 4), (512, 4),
]


class VGG19Features(nn.Module):
    """Returns the 5 feature slices used by the perceptual loss.

    Slice boundaries follow the reference Vgg19 (networks.py:417-447):
    torchvision feature indices [0:2], [2:7], [7:12], [12:21], [21:30] —
    i.e. activations after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1.
    """

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """x: [B, H, W, 3] in [-1, 1] (pix2pixHD feeds tanh outputs)."""
        outs = []
        h = x
        for b, (ch, n_convs) in enumerate(_VGG_PLAN):
            for c in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name=f"conv{b}_{c}")(h)
                h = nn.relu(h)
                if c == 0:
                    outs.append(h)  # relu{b+1}_1
                if len(outs) == 5 and b == 4 and c == 0:
                    return outs
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return outs


VGG_SLICE_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]


def vgg_perceptual_loss(
    vgg: VGG19Features,
    vgg_params,
    fake: jnp.ndarray,
    real: jnp.ndarray,
) -> jnp.ndarray:
    import jax

    f_feats = vgg.apply(vgg_params, fake)
    r_feats = vgg.apply(vgg_params, jax.lax.stop_gradient(real))
    loss = 0.0
    for w, f, r in zip(VGG_SLICE_WEIGHTS, f_feats, r_feats):
        loss = loss + w * jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss


def convert_torchvision_vgg19(state_dict) -> dict:
    """torchvision vgg19().features state dict -> VGG19Features params.

    Only the 13 convs up to relu5_1 are used by the loss slices."""
    plan = [
        ("conv0_0", 0), ("conv0_1", 2),
        ("conv1_0", 5), ("conv1_1", 7),
        ("conv2_0", 10), ("conv2_1", 12), ("conv2_2", 14), ("conv2_3", 16),
        ("conv3_0", 19), ("conv3_1", 21), ("conv3_2", 23), ("conv3_3", 25),
        ("conv4_0", 28),
    ]
    params = {}
    for name, ti in plan:
        w = np.asarray(state_dict[f"{ti}.weight"])
        b = np.asarray(state_dict[f"{ti}.bias"])
        params[name] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}
