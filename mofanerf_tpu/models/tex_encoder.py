"""UV texture-map encoder CNN.

Parity with reference `EnDeUVmap`/`Encoder` (models/tex_encoder_mod.py:7-100):
512x512x3 UV map -> 7 stride-2 4x4 convs (3->32->32->32->32->64->128->256),
LeakyReLU(0.2), flatten 256*4*4 -> FC 512 -> `mu` FC -> tex_dim, then a
3-layer LeakyReLU(0.1) "decoding" MLP head. The reference's VAE machinery
(logstd/KL) is commented out there; we keep only the deterministic path but
retain a `logstd` head parameter-compatible slot is NOT created (dead code
is not ported).

TPU notes: NHWC layout (XLA-native on TPU), conv via flax.linen; runs once
per frame so it is off the hot path, but it is jit-compatible and batches
over frames for the training step.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class TextureEncoder(nn.Module):
    tex_dim: int = 256

    @nn.compact
    def __call__(self, uv_map: jnp.ndarray) -> jnp.ndarray:
        """uv_map: [B, 512, 512, 3] in [0,1] -> [B, tex_dim]."""
        x = uv_map
        widths = (32, 32, 32, 32, 64, 128, 256)
        for w in widths:
            x = nn.Conv(w, kernel_size=(4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = x.reshape(x.shape[0], -1)  # [B, 4*4*256]
        x = nn.Dense(512)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        z = nn.Dense(self.tex_dim, name="mu")(x)
        h = z
        for i in range(3):
            h = nn.Dense(self.tex_dim, name=f"decoding_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.1)
        return h
