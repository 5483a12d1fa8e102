"""RefineNet generators — pix2pixHD-style, in Flax (NHWC).

Capability parity with the reference's vendored pix2pixHD generators
(tools/refine_mod/models/networks.py:138-311): `GlobalGenerator` =
c7s1-ngf reflect-padded stem, n stride-2 downsamples, 9 ResNet blocks,
n transposed-conv upsamples, c7s1-3 + tanh; `LocalEnhancer` wraps it for
2x resolution. The reference config uses ngf=32, n_downsample_global=4,
n_blocks_global=9, instance norm
(tools/refine_mod/options/base_options.py:61 + refineNet README flags).

TPU notes: NHWC layout, instance norm = GroupNorm(groups=C) without
affine (torch InstanceNorm2d default), reflection padding via jnp.pad.
Conv channel counts are powers of two times 32 — MXU-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    """Per-sample per-channel spatial normalization, no affine (matches
    torch nn.InstanceNorm2d defaults used by pix2pixHD)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv-norm-relu-conv-norm residual block
    (networks.py:232-270)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = InstanceNorm()(h)
        return x + h


class GlobalGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 32
    n_downsampling: int = 4
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] in [-1, 1] -> [B, H, W, output_nc] in [-1, 1]."""
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID")(h)
        h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
            h = nn.relu(InstanceNorm()(h))
        mult = 2 ** self.n_downsampling
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult)(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


class LocalEnhancer(nn.Module):
    """2x-resolution wrapper: global generator on the downsampled input +
    a local enhancer branch merged before residual upsampling
    (networks.py:138-196). Optional in the reference config; provided for
    surface parity."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_blocks_local: int = 3

    @nn.compact
    def __call__(self, x):
        x_down = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                             count_include_pad=False)

        # global branch without its final conv (trunk features)
        g = _reflect_pad(x_down, 3)
        g = nn.Conv(self.ngf * 2, (7, 7), padding="VALID")(g)
        g = nn.relu(InstanceNorm()(g))
        for i in range(self.n_downsample_global):
            mult = 2 ** i
            g = nn.Conv(self.ngf * 2 * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))(g)
            g = nn.relu(InstanceNorm()(g))
        mult = 2 ** self.n_downsample_global
        for _ in range(self.n_blocks_global):
            g = ResnetBlock(self.ngf * 2 * mult)(g)
        for i in range(self.n_downsample_global):
            mult = 2 ** (self.n_downsample_global - i)
            g = nn.ConvTranspose(self.ngf * 2 * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME")(g)
            g = nn.relu(InstanceNorm()(g))

        # local branch on the full-res input
        l = _reflect_pad(x, 3)
        l = nn.Conv(self.ngf, (7, 7), padding="VALID")(l)
        l = nn.relu(InstanceNorm()(l))
        l = nn.Conv(self.ngf * 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(l)
        l = nn.relu(InstanceNorm()(l))

        h = l + g
        for _ in range(self.n_blocks_local):
            h = ResnetBlock(self.ngf * 2)(h)
        h = nn.ConvTranspose(self.ngf, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)
