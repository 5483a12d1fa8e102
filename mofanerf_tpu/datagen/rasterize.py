"""Vectorized software rasterizer (JAX) — z-buffered flat-shaded triangles.

Replaces the reference's pyrender/OpenGL offscreen renderer
(tools/train_data_pre/render.py:13-67) — GL is unavailable here, and a
vectorized rasterizer runs on CPU or TPU alike.

Algorithm: every triangle rasterizes a fixed TILE x TILE pixel window
anchored at its screen bbox (faces in this dataset are small on screen);
inside/front tests via barycentrics; depths scatter-min into the z-buffer,
then colors scatter where the depth matches the winning z. Fixed shapes
throughout — one jit, no data-dependent control flow.

Limitations (documented): triangles larger than TILE pixels on screen are
only partially filled — raise `tile` for close-ups; ties at equal depth are
resolved arbitrarily.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("H", "W", "tile"))
def _rasterize(verts_cam, faces, colors, fx, fy, cx, cy, H: int, W: int, tile: int):
    v = verts_cam[faces]  # [F, 3, 3] camera-space triangle verts
    z = -v[..., 2]  # depth along view (camera looks down -z)
    valid_tri = (z > 1e-6).all(axis=1)

    # screen projection (same pixel model as ops.rays.get_rays)
    px = cx + fx * v[..., 0] / z
    py = cy - fy * v[..., 1] / z
    pts = jnp.stack([px, py], axis=-1)  # [F, 3, 2]

    x0 = jnp.clip(jnp.floor(pts[..., 0].min(axis=1)), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(pts[..., 1].min(axis=1)), 0, H - 1).astype(jnp.int32)

    dx = jnp.arange(tile)
    gy, gx = jnp.meshgrid(dx, dx, indexing="ij")
    # per-triangle pixel grids [F, tile*tile]
    pxs = (x0[:, None] + gx.reshape(-1)[None, :])
    pys = (y0[:, None] + gy.reshape(-1)[None, :])
    inb = (pxs < W) & (pys < H)

    fpx = pxs.astype(jnp.float32) + 0.5
    fpy = pys.astype(jnp.float32) + 0.5

    ax, ay = pts[:, 0, 0][:, None], pts[:, 0, 1][:, None]
    bx, by = pts[:, 1, 0][:, None], pts[:, 1, 1][:, None]
    cx_, cy_ = pts[:, 2, 0][:, None], pts[:, 2, 1][:, None]

    def edge(x0, y0, x1, y1, px, py):
        return (px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)

    area = edge(ax, ay, bx, by, cx_, cy_)
    w0 = edge(bx, by, cx_, cy_, fpx, fpy)
    w1 = edge(cx_, cy_, ax, ay, fpx, fpy)
    w2 = edge(ax, ay, bx, by, fpx, fpy)
    denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (
        ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)) | ((b0 <= 0) & (b1 <= 0) & (b2 <= 0))
    ) & (jnp.abs(area) > 1e-9)

    depth = b0 * z[:, 0:1] + b1 * z[:, 1:2] + b2 * z[:, 2:3]
    ok = inside & inb & valid_tri[:, None] & (depth > 1e-6)
    depth = jnp.where(ok, depth, jnp.inf)

    flat_idx = jnp.where(ok, pys * W + pxs, 0)
    zbuf = jnp.full((H * W,), jnp.inf)
    zbuf = zbuf.at[flat_idx.reshape(-1)].min(depth.reshape(-1))

    # second pass: write color where this fragment won the depth test
    # (losing fragments scatter to the out-of-range index and are dropped)
    won = ok & (depth <= zbuf[flat_idx] * (1 + 1e-6))
    frag_color = jnp.broadcast_to(colors[:, None, :], depth.shape + (3,))
    safe_idx = jnp.where(won.reshape(-1), flat_idx.reshape(-1), H * W)
    img = jnp.zeros((H * W, 3)).at[safe_idx].set(frag_color.reshape(-1, 3), mode="drop")
    hit = jnp.isfinite(zbuf)
    return img.reshape(H, W, 3), zbuf.reshape(H, W), hit.reshape(H, W)


def rasterize_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    c2w: np.ndarray,
    H: int = 512,
    W: int = 512,
    light_dir=(0.0, 0.0, 1.0),
    base_color=(0.75, 0.65, 0.6),
    ambient: float = 0.25,
    tile: int = 24,
    face_albedo: np.ndarray | None = None,
):
    """Flat-shaded render. Returns (rgb [H,W,3] float, depth [H,W], mask).

    Shading: lambertian against a headlight-style directional light in
    CAMERA space (matches the reference's directional-light flat shading,
    render.py:56-62). `face_albedo` [F, 3] overrides the uniform
    `base_color` with a per-face albedo (textured meshes, e.g. the
    synthetic face family in datagen/synthetic_faces.py)."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int32)
    R = np.asarray(c2w)[:3, :3]
    t = np.asarray(c2w)[:3, 3]
    verts_cam = (verts - t) @ R  # world -> camera

    tri = verts_cam[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    l = np.asarray(light_dir, np.float64)
    l = l / np.linalg.norm(l)
    lam = np.abs(n @ l)
    shade = np.clip(ambient + (1 - ambient) * lam, 0, 1)
    if face_albedo is not None:
        albedo = np.asarray(face_albedo, np.float64)
        assert albedo.shape == (faces.shape[0], 3), albedo.shape
    else:
        albedo = np.broadcast_to(np.asarray(base_color, np.float64), (faces.shape[0], 3))
    colors = shade[:, None] * albedo

    img, depth, mask = _rasterize(
        jnp.asarray(verts_cam, jnp.float32),
        jnp.asarray(faces),
        jnp.asarray(colors, jnp.float32),
        float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]),
        H, W, tile,
    )
    return np.asarray(img), np.asarray(depth), np.asarray(mask)
