"""Multiscale PatchGAN discriminator — pix2pixHD-style, in Flax.

Parity with tools/refine_mod/models/networks.py:314-411: num_D (=2 in the
reference config, base_options.py) discriminators over an avg-pool image
pyramid, each a 70x70 PatchGAN (`NLayerDiscriminator`, n_layers=3) with
instance norm and LeakyReLU(0.2); intermediate features returned for the
feature-matching loss.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import flax.linen as nn

from mofanerf_tpu.models.refine.generator import InstanceNorm


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """Returns the per-stage feature list (last entry = patch logits)."""
        feats = []
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)))(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        feats.append(h)
        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)))(h)
            h = nn.leaky_relu(InstanceNorm()(h), negative_slope=0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)))(h)
        h = nn.leaky_relu(InstanceNorm()(h), negative_slope=0.2)
        feats.append(h)
        h = nn.Conv(1, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)))(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        """x: [B, H, W, C] -> per-scale feature lists (coarsest scale
        first, matching the reference's iteration order)."""
        results = []
        cur = x
        pyramids = [cur]
        for _ in range(self.num_D - 1):
            cur = nn.avg_pool(
                cur, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                count_include_pad=False,
            )
            pyramids.append(cur)
        # reference applies D_{num_D-1-i} to pyramid level i (full res first)
        for i, level in enumerate(pyramids):
            results.append(NLayerDiscriminator(self.ndf, self.n_layers,
                                               name=f"scale_{self.num_D - 1 - i}")(level))
        return results
