import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    fold_conditioning,
    apply_field_folded,
)
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.composite import composite
from mofanerf_tpu.ops.occupancy import (
    OccupancyGrid,
    build_occupancy_grid,
    occupancy_lookup,
    render_rays_occupancy,
)
from mofanerf_tpu.ops.sampling import stratified_z_vals

CFG = FieldConfig(depth=8, width=32)
NEAR, FAR = 8.0, 26.0


def _setup():
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    cond = fold_conditioning(params, jnp.zeros(50), jnp.zeros(30), jnp.zeros(256))
    rng = np.random.default_rng(0)
    n = 16
    ro = jnp.zeros((n, 3))
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    return params, cond, ro, rd


def test_lookup_inside_outside():
    G = 8
    occ = jnp.zeros((G, G, G), bool).at[4, 4, 4].set(True)
    grid = OccupancyGrid(occ, jnp.asarray([-1.0] * 3), jnp.asarray([1.0] * 3))
    pts = jnp.asarray([[0.125, 0.125, 0.125], [-0.9, -0.9, -0.9], [5.0, 0, 0]])
    got = np.asarray(occupancy_lookup(grid, pts))
    assert got.tolist() == [True, False, False]


def test_full_grid_matches_dense_render():
    """All-occupied grid with k_keep == s_probe must equal a plain
    stratified render of the fine field."""
    params, cond, ro, rd = _setup()
    G = 4
    grid = OccupancyGrid(
        jnp.ones((G, G, G), bool), jnp.asarray([-30.0] * 3), jnp.asarray([30.0] * 3)
    )
    S = 16
    out = render_rays_occupancy(params, CFG, cond, grid, ro, rd, NEAR, FAR,
                                s_probe=S, k_keep=S)

    z = stratified_z_vals(None, jnp.full((16, 1), NEAR), jnp.full((16, 1), FAR), S)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    de = fourier_embed(viewdirs, CFG.multires_views)
    dirf = de @ params["view"]["w_dirs"]
    pe = fourier_embed(pts.reshape(-1, 3), CFG.multires)
    rgb, sig = apply_field_folded(params, cond, pe, dirf, CFG, samples_per_ray=S)
    ref = composite(rgb.reshape(16, S, 3), sig.reshape(16, S), z, rd)

    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["acc"]), np.asarray(ref.acc), atol=1e-4)


def test_empty_grid_renders_background():
    params, cond, ro, rd = _setup()
    grid = OccupancyGrid(
        jnp.zeros((4, 4, 4), bool), jnp.asarray([-30.0] * 3), jnp.asarray([30.0] * 3)
    )
    out = render_rays_occupancy(params, CFG, cond, grid, ro, rd, NEAR, FAR,
                                s_probe=16, k_keep=8)
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)
    # white background variant
    outw = render_rays_occupancy(params, CFG, cond, grid, ro, rd, NEAR, FAR,
                                 s_probe=16, k_keep=8, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(outw["rgb"]), 1.0, atol=1e-6)


def test_shell_grid_concentrates_samples():
    """With occupancy limited to a radial shell, kept depths must lie in the
    shell's depth range for rays through it."""
    params, cond, ro, rd = _setup()
    # occupancy: spherical shell radius 14..18 around origin, rays from origin
    G = 32
    lo, hi = -20.0, 20.0
    t = (np.arange(G) + 0.5) / G * (hi - lo) + lo
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    R = np.sqrt(X**2 + Y**2 + Z**2)
    occ = (R > 14) & (R < 18)
    grid = OccupancyGrid(jnp.asarray(occ), jnp.asarray([lo] * 3), jnp.asarray([hi] * 3))
    out = render_rays_occupancy(params, CFG, cond, grid, ro, rd, NEAR, FAR,
                                s_probe=64, k_keep=8)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # depth (where acc is meaningful) falls inside the shell band
    acc = np.asarray(out["acc"])
    depth = np.asarray(out["depth"])
    hit = acc > 0.5
    if hit.any():
        assert (depth[hit] > 12.5).all() and (depth[hit] < 19.5).all()


def test_build_grid_from_field():
    params, cond, _, _ = _setup()
    grid = build_occupancy_grid(
        params, CFG, cond, resolution=16,
        aabb_min=(-5, -5, -5), aabb_max=(5, 5, 5),
        density_threshold=0.0, chunk=1024,
    )
    assert grid.occ.shape == (16, 16, 16)
    occ_frac = float(jnp.mean(grid.occ))
    assert 0.0 <= occ_frac <= 1.0


def test_ray_aabb_hit():
    from mofanerf_tpu.ops.occupancy import ray_aabb_hit

    grid = OccupancyGrid(
        jnp.ones((4, 4, 4), bool), jnp.asarray([-2.0] * 3), jnp.asarray([2.0] * 3)
    )
    ro = jnp.asarray([[0.0, 0, 16], [0, 0, 16], [10, 10, 16]])
    rd = jnp.asarray([[0.0, 0, -1], [0, 1, 0], [0, 0, -1.0]])
    hit = np.asarray(ray_aabb_hit(grid, ro, rd, NEAR, FAR))
    assert hit.tolist() == [True, False, False]


def test_frame_fast_compaction_matches_uncompacted():
    from mofanerf_tpu.ops.occupancy import render_frame_fast
    from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning, exp_code_for
    from mofanerf_tpu.models.field import FieldConfig as FC
    from mofanerf_tpu.ops.rays import pose_spherical

    spec = MoFaNeRF(
        coarse=FC(depth=8, width=16), fine=FC(depth=8, width=16),
        render=RenderConfig(n_coarse=8, n_importance=8, packet_size=32),
        uv_size=128,
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(params, spec, jnp.zeros(50), exp_code_for(params, 0),
                                jnp.zeros(256))
    # small central AABB: corner rays of a wide-FOV camera miss it
    G = 8
    grid = OccupancyGrid(jnp.ones((G, G, G), bool),
                         jnp.asarray([-2.0] * 3), jnp.asarray([2.0] * 3))
    K = jnp.asarray([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(10.0, -5.0, 16.0))[:3]

    full = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=16, k_keep=8, hit_fraction=1.0)
    comp = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=16, k_keep=8, hit_fraction=0.6)
    a, b = np.asarray(full["rgb"]), np.asarray(comp["rgb"])
    # provided the hit budget covers all true hits, results must agree
    np.testing.assert_allclose(b, a, atol=2e-3)
    # background pixels exist and are exactly background in the compacted path
    acc = np.asarray(comp["acc"])
    assert (acc == 0).any()


def test_update_occupancy_grid_ema():
    from mofanerf_tpu.ops.occupancy import update_occupancy_grid, probe_density

    params, cond, _, _ = _setup()
    G = 8
    grid = OccupancyGrid(jnp.zeros((G, G, G), bool),
                         jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))
    ema0 = jnp.full((G ** 3,), 100.0)  # stale high density everywhere
    g1, ema1 = update_occupancy_grid(grid, ema0, params, CFG, cond,
                                     decay=0.5, density_threshold=10.0)
    # decayed stale density still above threshold -> occupied
    assert bool(g1.occ.all())
    # repeated updates with a low-density field decay toward the fresh probe
    fresh = probe_density(params, CFG, cond, grid)
    g, ema = g1, ema1
    for _ in range(12):
        g, ema = update_occupancy_grid(g, ema, params, CFG, cond,
                                       decay=0.5, density_threshold=10.0)
    # ema converges to max(fresh, ema*decay^k) ~= fresh once stale mass decays
    diff = float(jnp.max(jnp.abs(ema - jnp.maximum(fresh, ema * 0))))
    assert diff < 1.0, diff
    # occupancy now reflects the (low-density random) field, not the stale init
    assert float(jnp.mean(g.occ)) < 1.0


def test_frame_fast_budget_clamped_to_ray_count():
    """Regression: a high hit_fraction on a frame smaller than one packet
    used to round the budget past the ray count and crash on reshape."""
    from mofanerf_tpu.ops.occupancy import render_frame_fast
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning, exp_code_for,
    )
    from mofanerf_tpu.models.field import FieldConfig as FC
    from mofanerf_tpu.ops.rays import pose_spherical

    spec = MoFaNeRF(
        coarse=FC(depth=8, width=16), fine=FC(depth=8, width=16),
        render=RenderConfig(n_coarse=4, n_importance=4, packet_size=64),
        uv_size=128,
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(params, spec, jnp.zeros(50), exp_code_for(params, 0),
                                jnp.zeros(256))
    grid = OccupancyGrid(jnp.ones((4, 4, 4), bool),
                         jnp.asarray([-2.0] * 3), jnp.asarray([2.0] * 3))
    K = jnp.asarray([[8.0, 0, 5], [0, 8.0, 5], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(0.0, 0.0, 16.0))[:3]
    out = render_frame_fast(params, spec, cond.fine, grid, 10, 10, K, c2w,
                            s_probe=8, k_keep=4, hit_fraction=0.99)
    assert out["rgb"].shape == (10, 10, 3)


def test_frame_fast_background_disp_budget_invariant():
    """disp for rays missing the AABB must be identical whether or not the
    frame-level compaction path handled them."""
    from mofanerf_tpu.ops.occupancy import render_frame_fast
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning, exp_code_for,
    )
    from mofanerf_tpu.models.field import FieldConfig as FC
    from mofanerf_tpu.ops.rays import pose_spherical

    spec = MoFaNeRF(
        coarse=FC(depth=8, width=16), fine=FC(depth=8, width=16),
        render=RenderConfig(n_coarse=4, n_importance=4, packet_size=32),
        uv_size=128,
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(params, spec, jnp.zeros(50), exp_code_for(params, 0),
                                jnp.zeros(256))
    grid = OccupancyGrid(jnp.ones((4, 4, 4), bool),
                         jnp.asarray([-1.0] * 3), jnp.asarray([1.0] * 3))
    K = jnp.asarray([[4.0, 0, 8], [0, 4.0, 8], [0, 0, 1]])  # wide FOV: corners miss
    c2w = jnp.asarray(pose_spherical(0.0, 0.0, 16.0))[:3]
    full = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=8, k_keep=4, hit_fraction=1.0)
    comp = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=8, k_keep=4, hit_fraction=0.5)
    bg = np.asarray(comp["acc"]) == 0
    assert bg.any()
    np.testing.assert_allclose(np.asarray(comp["disp"])[bg],
                               np.asarray(full["disp"])[bg])


def test_pose_spherical_facescape_frame():
    """(0,0,r) is a frontal camera at +z in the FaceScape frame — no
    Blender world flip (tools/load_facescape.py:33-38)."""
    from mofanerf_tpu.ops.rays import pose_spherical

    c2w = pose_spherical(0.0, 0.0, 16.0)
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 16.0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, :3], np.eye(3), atol=1e-6)
    # azimuth rotates about y: camera x moves, height unchanged
    c2 = pose_spherical(90.0, 0.0, 16.0)
    np.testing.assert_allclose(abs(c2[0, 3]), 16.0, atol=1e-4)
    np.testing.assert_allclose(c2[1, 3], 0.0, atol=1e-6)


def test_frame_fast_auto_budget_never_drops_foreground():
    """Close-up framing (every ray hits the AABB) used to silently lose
    rays under a static 0.5 budget; auto-budgeting must match the
    uncompacted render exactly."""
    from mofanerf_tpu.ops.occupancy import render_frame_fast
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning, exp_code_for,
    )
    from mofanerf_tpu.models.field import FieldConfig as FC
    from mofanerf_tpu.ops.rays import pose_spherical

    spec = MoFaNeRF(
        coarse=FC(depth=8, width=16), fine=FC(depth=8, width=16),
        render=RenderConfig(n_coarse=4, n_importance=4, packet_size=32),
        uv_size=128,
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(params, spec, jnp.zeros(50), exp_code_for(params, 0),
                                jnp.zeros(256))
    # huge AABB: the whole frame is foreground (close-up framing)
    grid = OccupancyGrid(jnp.ones((4, 4, 4), bool),
                         jnp.asarray([-30.0] * 3), jnp.asarray([30.0] * 3))
    K = jnp.asarray([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(0.0, 0.0, 16.0))[:3]
    full = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=8, k_keep=4, hit_fraction=1.0)
    auto = render_frame_fast(params, spec, cond.fine, grid, 16, 16, K, c2w,
                             s_probe=8, k_keep=4)  # hit_fraction=None -> auto
    # auto must pick the full budget (every ray hits) -> bit-identical output,
    # no ray routed through the background fill
    np.testing.assert_array_equal(np.asarray(auto["rgb"]), np.asarray(full["rgb"]))
    np.testing.assert_array_equal(np.asarray(auto["acc"]), np.asarray(full["acc"]))


def test_grid_save_load_roundtrip(tmp_path):
    from mofanerf_tpu.ops.occupancy import save_grid, load_grid

    G = 8
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.random((G, G, G)) < 0.3)
    grid = OccupancyGrid(occ, jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))
    ema = jnp.asarray(rng.random(G ** 3).astype(np.float32))
    path = str(tmp_path / "grid.npz")
    save_grid(path, grid, ema)
    g2, ema2 = load_grid(path)
    np.testing.assert_array_equal(np.asarray(g2.occ), np.asarray(grid.occ))
    np.testing.assert_allclose(np.asarray(ema2), np.asarray(ema))
    np.testing.assert_allclose(np.asarray(g2.aabb_min), -5.0)
    # without ema
    save_grid(str(tmp_path / "g2.npz"), grid)
    g3, ema3 = load_grid(str(tmp_path / "g2.npz"))
    assert ema3 is None
    np.testing.assert_array_equal(np.asarray(g3.occ), np.asarray(grid.occ))


def test_grid_tracks_moving_density():
    """EMA maintenance must follow a density field that changes over
    training: occupancy grows when the field turns dense and decays back
    to empty (after the EMA drains) when it turns transparent."""
    from mofanerf_tpu.ops.occupancy import update_occupancy_grid

    params, cond, _, _ = _setup()
    G = 8
    grid = OccupancyGrid(jnp.zeros((G, G, G), bool),
                         jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))
    ema = jnp.zeros((G ** 3,), jnp.float32)

    # phase 1: field turns dense everywhere (alpha head bias pushed up)
    dense = jax.tree_util.tree_map(lambda x: x, params)
    dense["sigma"]["alpha"]["b"] = params["sigma"]["alpha"]["b"] + 100.0
    grid, ema = update_occupancy_grid(grid, ema, dense, CFG, cond,
                                      decay=0.5, density_threshold=10.0)
    assert bool(grid.occ.all()), "grid did not pick up the dense field"

    # phase 2: field turns transparent; repeated updates decay occupancy away
    clear = jax.tree_util.tree_map(lambda x: x, params)
    clear["sigma"]["alpha"]["b"] = params["sigma"]["alpha"]["b"] - 1000.0
    clear["sigma"]["alpha"]["w"] = params["sigma"]["alpha"]["w"] * 0.0
    for _ in range(8):
        grid, ema = update_occupancy_grid(grid, ema, clear, CFG, cond,
                                          decay=0.5, density_threshold=10.0)
    assert not bool(grid.occ.any()), "grid did not decay after density left"


def test_grid_aabb_tight_box():
    from mofanerf_tpu.ops.occupancy import grid_aabb

    G = 10
    occ = np.zeros((G, G, G), bool)
    occ[2:4, 5, 7] = True
    grid = OccupancyGrid(jnp.asarray(occ), jnp.asarray([0.0] * 3),
                         jnp.asarray([10.0] * 3))
    lo, hi = grid_aabb(grid, margin_cells=0)
    np.testing.assert_allclose(lo, [2.0, 5.0, 7.0])
    np.testing.assert_allclose(hi, [4.0, 6.0, 8.0])
    # margin clamps at the grid edge
    lo2, hi2 = grid_aabb(grid, margin_cells=10)
    np.testing.assert_allclose(lo2, [0.0] * 3)
    np.testing.assert_allclose(hi2, [10.0] * 3)
    # empty grid falls back to the full box
    empty = OccupancyGrid(jnp.zeros((G, G, G), bool), grid.aabb_min, grid.aabb_max)
    lo3, hi3 = grid_aabb(empty)
    np.testing.assert_allclose(lo3, [0.0] * 3)
    np.testing.assert_allclose(hi3, [10.0] * 3)


def test_proposal_grid_probes_coarse_field():
    """build_proposal_grid must consult the COARSE field: a two-pass-trained
    fine net is unconstrained off the importance-sample distribution (a real
    32-id checkpoint read 10-500 activated density through empty space from
    its fine net while its coarse net was clean — the fine-probed grid
    saturated and the culled render truncated rays mid-head)."""
    from mofanerf_tpu.config import Config
    from mofanerf_tpu.ops.occupancy import build_proposal_grid
    from mofanerf_tpu.render.renderer import prepare_conditioning, encode_texture
    from mofanerf_tpu.train.state import create_train_state

    cfg = Config(expname="t", basedir="/tmp", datadir="x",
                 netdepth=2, netwidth=8, netdepth_fine=2, netwidth_fine=16,
                 compute_dtype="float32")
    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    params = state.params
    # fine field: fog everywhere (huge sigma bias); coarse: empty everywhere
    params["fine"]["sigma"]["alpha"]["w"] = jnp.zeros_like(
        params["fine"]["sigma"]["alpha"]["w"])
    params["fine"]["sigma"]["alpha"]["b"] = jnp.full_like(
        params["fine"]["sigma"]["alpha"]["b"], 50.0)
    params["coarse"]["sigma"]["alpha"]["w"] = jnp.zeros_like(
        params["coarse"]["sigma"]["alpha"]["w"])
    params["coarse"]["sigma"]["alpha"]["b"] = jnp.full_like(
        params["coarse"]["sigma"]["alpha"]["b"], -50.0)
    tex = encode_texture(params, spec,
                         jnp.zeros((spec.uv_size, spec.uv_size, 3)))
    cond = prepare_conditioning(params, spec, jnp.zeros(50), jnp.zeros(30), tex)
    grid = build_proposal_grid(params, spec, cond, resolution=8, chunk=512)
    assert not bool(grid.occ.any()), "proposal grid must ignore the foggy fine field"
