"""Fixed-shape full-frame packet sweep with slab-test ray compaction.

Shared frame driver for every production render path (occupancy-culled
teacher rendering in ops/occupancy.py and the distilled-student serving
path in render/serve.py). Replaces the reference's Python chunk loop
(models/render_class.py:111-123) with one lax.map over static packets, and
its implicit "render every pixel" policy with an optional frame-level
compaction: a closed-form ray/AABB slab test orders face-hitting rays
first (pure arithmetic, no MLP), only the first `hit_fraction` of rays are
rendered, and the rest scatter back as analytic background.

hit_fraction=None auto-budgets: the frame's true hit count is measured on
the host (one tiny readback of a boolean mean) and bucketed UP to the next
canonical fraction, so no foreground ray is ever dropped and at most
len(HIT_BUDGET_BUCKETS) frame programs compile per (H, W, packet) shape.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mofanerf_tpu.ops.bounds import ray_aabb_interval
from mofanerf_tpu.ops.rays import get_rays

HIT_BUDGET_BUCKETS = (0.25, 0.5, 0.75, 1.0)


def bucket_fraction(frac: float, buckets=HIT_BUDGET_BUCKETS) -> float:
    """Smallest canonical budget covering `frac`."""
    for b in sorted(buckets):
        if frac <= b:
            return b
    return 1.0


def _compact_rays(ro_flat, rd_flat, p, aabb_min, aabb_max, near, far,
                  hit_fraction):
    """Shared slab-test compaction: order face-hitting rays first and keep a
    whole-packets budget. Returns (ro, rd, sel, n_eval); sel is None when no
    compaction applied."""
    n = ro_flat.shape[0]
    hit = None
    if hit_fraction is None or hit_fraction < 1.0:
        _, _, hit = ray_aabb_interval(ro_flat, rd_flat, aabb_min, aabb_max, near, far)
    if hit_fraction is None:
        if isinstance(ro_flat, jax.core.Tracer):
            raise ValueError(
                "auto-budgeted compaction (hit_fraction=None) measures the "
                "frame's hit count on the host and cannot run under jit — "
                "pass an explicit hit_fraction (e.g. 1.0 or 0.5) when "
                "jitting the frame renderer, or call it un-jitted"
            )
        hit_fraction = bucket_fraction(float(jnp.mean(hit)))

    if hit_fraction < 1.0:
        order = jnp.argsort(~hit)  # hits first, stable
        # round the budget up to whole packets, clamped to the ray count
        m = min(int(-(-int(n * hit_fraction) // p) * p), n)
        sel = order[:m]
        return ro_flat[sel], rd_flat[sel], sel, m
    return ro_flat, rd_flat, None, n


_BG_FILL = {"rgb": None, "disp": 1e10, "acc": 0.0, "depth": 0.0}


def _scatter_background(maps, sel, n, n_eval, white_bkgd):
    """Unpad packet outputs and scatter compacted rays back over analytic
    background values (matching composite()'s all-empty-ray outputs)."""
    out = {}
    for k, v in maps.items():
        flat = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])[:n_eval]
        if sel is not None:
            fill = _BG_FILL.get(k, 0.0)
            if k == "rgb":
                fill = 1.0 if white_bkgd else 0.0
            full = jnp.full((n,) + flat.shape[1:], fill, flat.dtype)
            full = full.at[sel].set(flat)
        else:
            full = flat
        out[k] = full
    return out


def sweep_rays(
    ray_fn: Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    ro_flat: jnp.ndarray,   # [N, 3]
    rd_flat: jnp.ndarray,   # [N, 3]
    packet_size: int,
    aabb_min=None,
    aabb_max=None,
    near: float = 0.0,
    far: float = jnp.inf,
    hit_fraction: float | None = 1.0,
    white_bkgd: bool = False,
    packet_multiple: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Sweep `ray_fn` over an arbitrary flat ray stream in fixed-size
    packets with optional slab compaction. Returns flat [N, ...] maps —
    the frame/path renderers reshape. Batching several frames into one
    stream amortizes packet glue and lets compaction pool background
    across frames.

    packet_multiple: round the packet size UP to this granularity (the
    fused Pallas kernel requires whole 256-ray blocks; padding covers the
    remainder)."""
    n = ro_flat.shape[0]
    p = min(packet_size, n)
    p = -(-p // packet_multiple) * packet_multiple
    ro_flat, rd_flat, sel, n_eval = _compact_rays(
        ro_flat, rd_flat, p, aabb_min, aabb_max, near, far, hit_fraction
    )

    n_pad = (-n_eval) % p
    ro = jnp.concatenate([ro_flat, jnp.ones((n_pad, 3))], axis=0).reshape(-1, p, 3)
    rd = jnp.concatenate([rd_flat, jnp.ones((n_pad, 3))], axis=0).reshape(-1, p, 3)

    maps = jax.lax.map(lambda args: ray_fn(args[0], args[1]), (ro, rd))
    # background fills match composite()'s values for an all-empty ray so
    # disp/acc/depth are budget-invariant (disp of an empty ray is 1e10)
    return _scatter_background(maps, sel, n, n_eval, white_bkgd)


def sweep_frame(
    ray_fn: Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    packet_size: int,
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Render a full frame by sweeping `ray_fn` (rays_o, rays_d) -> dict of
    per-ray outputs over fixed-size packets. Requires aabb_min/aabb_max for
    any hit_fraction != 1.0 (see sweep_rays). Returns [H, W, ...] maps."""
    rays_o, rays_d = get_rays(H, W, K, c2w)
    out = sweep_rays(ray_fn, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
                     packet_size, **kw)
    return {k: v.reshape((H, W) + v.shape[1:]) for k, v in out.items()}
