"""Alpha compositing of raw field outputs into pixel values.

Behavioral parity with the reference `raw2outputs`
(models/render_class.py:440-482): alpha = 1 - exp(-relu(sigma) * delta),
weights via exclusive cumprod of transmittance, depth/disp/acc maps, optional
sigma-noise regularizer and white background.

TPU notes: the cumprod runs on the VPU along the (static) sample axis; the
whole function fuses with the field's output matmul under jit. Compositing is
kept in float32 even when the MLP runs bfloat16 — transmittance products are
precision-sensitive.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray      # [N_rays, 3]
    disp: jnp.ndarray     # [N_rays]
    acc: jnp.ndarray      # [N_rays]
    weights: jnp.ndarray  # [N_rays, N_samples]
    depth: jnp.ndarray    # [N_rays]


def sigma_act(name: str):
    """Density activation by name — the ONE place the string is interpreted,
    so a typo raises instead of silently flipping activations."""
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return jax.nn.softplus
    raise ValueError(f"sigma_activation must be 'relu' or 'softplus', got {name!r}")


def composite(
    raw_rgb: jnp.ndarray,
    raw_sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    key: jax.Array | None = None,
    sigma_activation: str = "relu",
) -> CompositeOut:
    """raw_rgb: [N_rays, S, 3] pre-sigmoid; raw_sigma: [N_rays, S]; z_vals:
    [N_rays, S]; rays_d: [N_rays, 3].

    sigma_activation: 'relu' (reference parity, render_class.py:454) or
    'softplus' — a training-stability option: relu's dead zone lets early
    background-dominated gradients drag the raw density irrecoverably
    negative at large widths (measured: raw sigma -2700 within 50 steps at
    10x1024), while softplus keeps a recovery gradient everywhere. A field
    trained with one activation must be composited with the same one
    downstream."""
    raw_rgb = raw_rgb.astype(jnp.float32)
    raw_sigma = raw_sigma.astype(jnp.float32)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )  # [N_rays, S]
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw_rgb)

    if raw_noise_std > 0.0:
        assert key is not None, "sigma noise requires a PRNG key"
        raw_sigma = raw_sigma + jax.random.normal(key, raw_sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-sigma_act(sigma_activation)(raw_sigma) * dists)
    # Exclusive cumprod of transmittance: T_i = prod_{j<i} (1 - alpha_j + eps)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return CompositeOut(rgb_map, disp_map, acc_map, weights, depth_map)
