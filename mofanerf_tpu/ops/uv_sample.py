"""Differentiable bilinear UV-map sampling.

Parity with the reference `BilinearSampling` (models/model.py:249-264): a
differentiable bilinear lookup of RGB values in a UV texture map (legacy of
the paper's texture-space supervision; kept as public API surface).

TPU-native: gather-based, vectorized, valid under jit/vmap/grad.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(uv_map: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """uv_map: [H, W, C]; coords: [N, 2] float (row, col) pixel coordinates.
    Returns [N, C]. Gradients flow to both the map and the coordinates."""
    H, W = uv_map.shape[:2]
    r = jnp.clip(coords[:, 0], 0.0, H - 1.000001)
    c = jnp.clip(coords[:, 1], 0.0, W - 1.000001)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, H - 1)
    c1 = jnp.minimum(c0 + 1, W - 1)
    fr = (r - r0)[:, None]
    fc = (c - c0)[:, None]
    v00 = uv_map[r0, c0]
    v01 = uv_map[r0, c1]
    v10 = uv_map[r1, c0]
    v11 = uv_map[r1, c1]
    return (
        v00 * (1 - fr) * (1 - fc)
        + v01 * (1 - fr) * fc
        + v10 * fr * (1 - fc)
        + v11 * fr * fc
    )
