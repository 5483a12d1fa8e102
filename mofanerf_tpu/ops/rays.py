"""Ray generation and camera-path helpers.

Behavioral parity with the reference (models/model.py:268-310 `get_rays`/
`ndc_rays`; tools/load_facescape.py:33-38 `pose_spherical`;
run_fit.py:116-127 `get_rays_withGrad`).

All functions are pure jnp with static shapes, differentiable w.r.t. the
camera matrix — which is what the fitting loop exploits to optimize pose by
gradient descent (the reference needed a dedicated `get_rays_withGrad`; in
JAX the ordinary implementation is already differentiable).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Pinhole rays for an HxW image.

    K: [3,3] intrinsics; c2w: [3,4] or [4,4] camera-to-world.
    Returns (rays_o, rays_d), each [H, W, 3]. Differentiable in c2w.

    Convention matches the reference (models/model.py:268-279): pixel grid in
    xy-indexing, camera looks down -z, y up.
    """
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], axis=-1
    )  # [H, W, 3] camera-frame directions
    rays_d = dirs @ c2w[:3, :3].T  # rotate into world frame
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_at(coords_ij: jnp.ndarray, K: jnp.ndarray, c2w: jnp.ndarray):
    """Rays for an arbitrary set of pixel coordinates.

    coords_ij: [N, 2] (row j, col i) pixel coordinates (float).
    Returns (rays_o [N,3], rays_d [N,3]). Differentiable in c2w.

    TPU rationale: the reference's fitting loop regenerates the FULL HxW ray
    grid each pyramid level and then gathers N_rand rays
    (run_fit.py:281-291) — a dynamic-shape pattern that would force one
    XLA recompile per level. Generating rays only at the selected
    coordinates keeps every fitting step at a single static [N_rand] shape
    across the whole coarse-to-fine schedule.
    """
    j = coords_ij[:, 0]
    i = coords_ij[:, 1]
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], axis=-1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Shift to near plane and project to NDC (models/model.py:293-310).

    Unused by the FaceScape path (ndc=False) but part of the public surface.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def _trans_t(t):
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_phi(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_theta(th):
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Spherical orbit camera pose in the FACESCAPE world frame
    (tools/load_facescape.py:33-38): (0, 0, r) puts the camera frontal at
    +z looking down -z; theta = azimuth about y, phi = elevation about x.

    NOTE: deliberately does NOT apply the Blender-NeRF world flip that the
    original NeRF's pose_spherical uses — FaceScape transforms are written
    without it, and applying it would orbit real identities around the
    wrong axis.

    Returns a [4,4] c2w numpy matrix (host-side; poses are data, not compute).
    """
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    return c2w
