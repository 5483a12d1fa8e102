"""Occupancy-grid sample culling — the production fast-render path.

The reference (and our reference-parity path) spends 192 MLP point-evals
per ray (64 coarse + 128 fine). For a face, the radiance field is a thin
shell: most samples hit empty space. This module implements the
TPU-native version of occupancy culling (the NerfAcc / Instant-NGP
technique, adapted to static shapes):

1. `build_occupancy_grid`: evaluate a trained field's density on a
   G^3 lattice over the face AABB once (one bench-call of compute), keep
   a boolean grid of cells above a density threshold, then DILATE by one
   cell (3^3 max-pool) so a thin occupied shell is always thicker than
   the ray-march probe spacing — without it a clean shell grid (cell
   0.156 units at G=64 vs probe spacing 0.28 at s_probe=64) aliases:
   most rays step clean over the surface and composite as background.
   Production grids probe the COARSE field (`build_proposal_grid`).
2. `render_rays_occupancy`: per ray, place `s_probe` stratified depths,
   look each up in the grid (pure gathers — no MLP), select the top
   `k_keep` OCCUPIED samples per ray (argsort on a composite key — a
   static-shape "compaction" that replaces data-dependent masking), and
   evaluate the fine MLP only on those. Culled samples never touch the
   MXU; rays that miss the face entirely still cost k_keep evals (static
   shapes) but k_keep << 192.

With s_probe=64, k_keep=32 this is ~6x fewer point-evals than the
reference budget at equal surface sampling density.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig, apply_field_folded, apply_field_sigma
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.composite import composite
from mofanerf_tpu.ops.sampling import stratified_z_vals
from mofanerf_tpu.ops.sweep import sweep_frame

Params = Dict[str, Any]


class OccupancyGrid(NamedTuple):
    occ: jnp.ndarray       # [G, G, G] bool
    aabb_min: jnp.ndarray  # [3]
    aabb_max: jnp.ndarray  # [3]


def dilate_occupancy(occ: jnp.ndarray, cells: int = 1) -> jnp.ndarray:
    """Morphological dilation (max-pool) of a boolean [G,G,G] grid.

    Guarantees conservative ray-march coverage: with G=64 over a 10-unit
    box a cell is 0.156 units, while s_probe=64 over [8, 26] probes every
    0.28 units — an undilated thin shell falls between probes on most
    rays. One cell of dilation makes the minimum occupied thickness
    3 cells = 0.47 units > any sane probe spacing."""
    if cells <= 0:
        return occ
    k = 2 * cells + 1
    x = jax.lax.reduce_window(
        occ.astype(jnp.float32), 0.0, jax.lax.max,
        (k, k, k), (1, 1, 1), "SAME")
    return x > 0.0


def build_occupancy_grid(
    params: Params,
    cfg: FieldConfig,
    cond: Params,
    resolution: int = 64,
    aabb_min=(-5.0, -5.0, -5.0),
    aabb_max=(5.0, 5.0, 5.0),
    density_threshold: float = 1.0,
    chunk: int = 65536,
    sigma_activation: str = "relu",
    dilate_cells: int = 1,
) -> OccupancyGrid:
    """Probe the fine field's sigma at cell centers. The default AABB covers
    the FaceScape head at world scale 1/50 (meshes clipped to a ~5-unit
    radius, tools/train_data_pre/predef maxDistance). The threshold
    compares ACTIVATED density, so it means the same thing for relu- and
    softplus-trained fields.

    Probe the COARSE field for production grids (build_proposal_grid): a
    two-pass-trained FINE field is only constrained ON the importance-sample
    distribution (face-local); off it, its density is arbitrary — a
    32-identity checkpoint measured 10-500 activated density through empty
    space from the fine net while its coarse net (trained on uniform
    stratified samples) was clean."""
    from mofanerf_tpu.ops.composite import sigma_act

    G = resolution
    lo = jnp.asarray(aabb_min, jnp.float32)
    hi = jnp.asarray(aabb_max, jnp.float32)
    shell = OccupancyGrid(jnp.zeros((G, G, G), bool), lo, hi)
    sig = sigma_act(sigma_activation)(probe_density(params, cfg, cond, shell, chunk))
    occ = dilate_occupancy((sig > density_threshold).reshape(G, G, G),
                           dilate_cells)
    return OccupancyGrid(occ, lo, hi)


def build_proposal_grid(params, spec, cond, **kw):
    """Occupancy grid from the COARSE (proposal) field of a two-pass model.

    The fine field must only ever be evaluated inside this grid's occupied
    band: in two-pass training (render/renderer.py) the fine net sees
    importance samples only, so its density off that distribution is
    unconstrained (observed: a fog floor >1.0 through the whole box on a
    32-id checkpoint, which saturated a fine-probed grid and broke culled
    renders). The coarse net is trained on uniform stratified samples along
    every training ray, so it is the field that legitimately answers "is
    this cell empty?" — the same proposal/refine split the two-pass
    renderer itself uses (reference models/render_class.py:321-332: the
    coarse pass's weights drive sample_pdf, and only those samples reach
    the fine net).

    `params`/`spec`/`cond` are the full-model pytrees (with .coarse/.fine);
    kw forwards to build_occupancy_grid."""
    kw.setdefault("sigma_activation", spec.render.sigma_activation)
    return build_occupancy_grid(params["coarse"], spec.coarse, cond.coarse, **kw)


def probe_density(
    params: Params,
    cfg: FieldConfig,
    cond: Params,
    grid: OccupancyGrid,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Evaluate the fine field's raw sigma at every cell center of `grid`.
    Returns [G^3] float32."""
    G = grid.occ.shape[0]
    lo, hi = grid.aabb_min, grid.aabb_max
    t = (jnp.arange(G) + 0.5) / G
    xs = lo[0] + t * (hi[0] - lo[0])
    ys = lo[1] + t * (hi[1] - lo[1])
    zs = lo[2] + t * (hi[2] - lo[2])
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    def probe(p):
        pe = fourier_embed(p, cfg.multires)
        # sigma-only apply: skips the rgb trunk + view head (~2x cheaper)
        return apply_field_sigma(params, cond, pe, cfg)[:, 0]

    n = pts.shape[0]
    c = min(chunk, n)
    n_pad = (-n) % c
    pts_p = jnp.concatenate([pts, jnp.zeros((n_pad, 3))], axis=0)
    sig = jax.lax.map(probe, pts_p.reshape(-1, c, 3)).reshape(-1)[:n]
    return sig.astype(jnp.float32)


def update_occupancy_grid(
    grid: OccupancyGrid,
    density_ema: jnp.ndarray,   # [G^3] float32 running density
    params: Params,
    cfg: FieldConfig,
    cond: Params,
    decay: float = 0.95,
    density_threshold: float = 1.0,
    sigma_activation: str = "relu",
    dilate_cells: int = 1,
):
    """Training-time grid maintenance (NerfAcc-style EMA): re-probe all
    cells, take max(ema * decay, fresh), rethreshold. Call every few
    hundred steps; one update costs ~a single render packet of compute.
    The EMA carries ACTIVATED density. Returns (new_grid, new_density_ema)."""
    from mofanerf_tpu.ops.composite import sigma_act

    fresh = sigma_act(sigma_activation)(probe_density(params, cfg, cond, grid))
    ema = jnp.maximum(density_ema * decay, fresh)
    G = grid.occ.shape[0]
    return (
        OccupancyGrid(dilate_occupancy((ema > density_threshold).reshape(G, G, G),
                                       dilate_cells),
                      grid.aabb_min, grid.aabb_max),
        ema,
    )


def occupancy_lookup(grid: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 3] -> bool occupancy (False outside the AABB)."""
    G = grid.occ.shape[0]
    u = (pts - grid.aabb_min) / (grid.aabb_max - grid.aabb_min)
    idx = jnp.floor(u * G).astype(jnp.int32)
    inside = ((idx >= 0) & (idx < G)).all(axis=-1)
    idx = jnp.clip(idx, 0, G - 1)
    occ = grid.occ[idx[..., 0], idx[..., 1], idx[..., 2]]
    return occ & inside


def render_rays_occupancy(
    params_fine: Params,
    cfg: FieldConfig,
    cond_fine: Params,
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,   # [N, 3]
    rays_d: jnp.ndarray,   # [N, 3]
    near: float,
    far: float,
    s_probe: int = 64,
    k_keep: int = 32,
    white_bkgd: bool = False,
    sigma_activation: str = "relu",
):
    """Deterministic occupancy-culled render of a ray packet.

    Returns {rgb, disp, acc, depth} like render_rays' fine outputs."""
    n = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    de = fourier_embed(viewdirs, cfg.multires_views)
    dirf = de @ params_fine["view"]["w_dirs"]

    z = stratified_z_vals(None, jnp.full((n, 1), near), jnp.full((n, 1), far),
                          s_probe, perturb=0.0)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = occupancy_lookup(grid, pts)  # [N, S]

    # Static-shape compaction: respace k_keep samples uniformly over the
    # ray's occupied depth band [first occupied probe, last occupied probe].
    # Unlike a "first k occupied probes" rule this cannot truncate a ray
    # mid-face when the grid is dense (a dense grid degrades to a
    # k_keep-sample uniform render of [near, far] — observed on a
    # 32-identity checkpoint whose density floor marked every cell
    # occupied); with a sparse grid it concentrates every sample on the
    # face slab just like the first-k rule. Rays that hit nothing park
    # past the far plane and composite as pure background.
    any_occ = occ.any(axis=-1)
    t0 = jnp.min(jnp.where(occ, z, jnp.inf), axis=-1)
    t1 = jnp.max(jnp.where(occ, z, -jnp.inf), axis=-1)
    t0 = jnp.where(any_occ, t0, far + 1.0)
    t1 = jnp.where(any_occ, t1, far + 2.0)
    frac = jnp.linspace(0.0, 1.0, k_keep)
    zk = t0[:, None] * (1.0 - frac) + t1[:, None] * frac
    keep_mask = zk <= far
    zk = jnp.minimum(zk, far)

    pts_k = rays_o[:, None, :] + rays_d[:, None, :] * zk[..., None]
    pe = fourier_embed(pts_k.reshape(-1, 3), cfg.multires)
    raw_rgb, raw_sigma = apply_field_folded(
        params_fine, cond_fine, pe, dirf, cfg, samples_per_ray=k_keep
    )
    raw_rgb = raw_rgb.reshape(n, k_keep, 3)
    raw_sigma = raw_sigma.reshape(n, k_keep)
    # culled slots contribute nothing even if the field disagrees with the grid
    raw_sigma = jnp.where(keep_mask, raw_sigma, -1e10)

    c = composite(raw_rgb, raw_sigma, zk, rays_d, 0.0, white_bkgd, None,
                  sigma_activation=sigma_activation)
    return {"rgb": c.rgb, "disp": c.disp, "acc": c.acc, "depth": c.depth}


def grid_aabb(grid: OccupancyGrid, margin_cells: int = 1):
    """Tight AABB of the grid's occupied cells (+ a safety margin), host-side.

    Connects the training-maintained grid to the serving path: the bounded
    renderer (render/serve.py) packs all its samples inside this box, so a
    tighter box is a direct sampling-density win. Falls back to the grid's
    full AABB when nothing is occupied."""
    import numpy as np

    occ = np.asarray(grid.occ)
    G = occ.shape[0]
    lo = np.asarray(grid.aabb_min, np.float64)
    hi = np.asarray(grid.aabb_max, np.float64)
    if not occ.any():
        return tuple(lo.tolist()), tuple(hi.tolist())
    cell = (hi - lo) / G
    idx = np.stack(np.nonzero(occ), axis=-1)  # [K, 3]
    cmin = np.maximum(idx.min(axis=0) - margin_cells, 0)
    cmax = np.minimum(idx.max(axis=0) + 1 + margin_cells, G)
    return (
        tuple((lo + cmin * cell).tolist()),
        tuple((lo + cmax * cell).tolist()),
    )


def save_grid(path: str, grid: OccupancyGrid, density_ema=None) -> None:
    """Persist a grid (+ optional EMA density carry) as a compressed npz —
    the training loop's sidecar checkpoint format."""
    import numpy as np

    G = grid.occ.shape[0]
    arrs = dict(
        resolution=G,
        occ=np.packbits(np.asarray(grid.occ)),
        aabb_min=np.asarray(grid.aabb_min),
        aabb_max=np.asarray(grid.aabb_max),
    )
    if density_ema is not None:
        arrs["density_ema"] = np.asarray(density_ema, np.float32)
    np.savez_compressed(path, **arrs)


def load_grid(path: str):
    """Inverse of save_grid. Returns (OccupancyGrid, density_ema | None)."""
    import numpy as np

    d = np.load(path)
    G = int(d["resolution"])
    bits = np.unpackbits(d["occ"])[: G ** 3]
    grid = OccupancyGrid(
        jnp.asarray(bits.reshape(G, G, G).astype(bool)),
        jnp.asarray(d["aabb_min"]),
        jnp.asarray(d["aabb_max"]),
    )
    ema = jnp.asarray(d["density_ema"]) if "density_ema" in d else None
    return grid, ema


def ray_aabb_hit(
    grid: OccupancyGrid, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
    near: float, far: float,
) -> jnp.ndarray:
    """Slab-test: does each ray's [near, far] segment intersect the grid's
    AABB? [N] bool — pure arithmetic, no MLP."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (grid.aabb_min - rays_o) * inv
    t1 = (grid.aabb_max - rays_o) * inv
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    return (tmax >= tmin) & (tmax >= near) & (tmin <= far)


def render_frame_fast(
    params: Params,
    spec,                      # render.renderer.MoFaNeRF
    cond_fine: Params,
    grid: OccupancyGrid,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    s_probe: int = 64,
    k_keep: int = 32,
    hit_fraction: float | None = None,
):
    """Full-frame occupancy-culled render (production path): fixed-size ray
    packets swept with lax.map, fine field only.

    hit_fraction < 1 additionally compacts background rays at the frame
    level: a closed-form ray-AABB slab test orders face-hitting rays first
    (one argsort — no MLP), only the first `hit_fraction` of rays go
    through the field, and results scatter back to pixel order with the
    remainder rendered as background. On face frames where ~half the rays
    miss the head AABB this roughly halves the MLP work again. Static
    shapes throughout: hit_fraction is a compile-time budget.

    hit_fraction=None (default) auto-budgets: the frame's true hit count is
    measured with the slab test and bucketed up to the next canonical
    fraction (HIT_BUDGET_BUCKETS), so no frame can silently lose foreground
    rays and at most len(buckets) frame programs ever compile. Pass an
    explicit fraction only when you control the camera framing and want a
    single compiled shape."""

    def packet(o, d):
        return render_rays_occupancy(
            params["fine"], spec.fine, cond_fine, grid, o, d,
            spec.render.near, spec.render.far, s_probe, k_keep,
            spec.render.white_bkgd, spec.render.sigma_activation,
        )

    return sweep_frame(
        packet, H, W, K, c2w, spec.render.packet_size,
        aabb_min=grid.aabb_min, aabb_max=grid.aabb_max,
        near=spec.render.near, far=spec.render.far,
        hit_fraction=hit_fraction, white_bkgd=spec.render.white_bkgd,
    )
