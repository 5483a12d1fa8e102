"""Tests for the gather-free serving path: analytic bounds, bounded
rendering, frame sweep, and field distillation."""
import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import (
    FieldConfig,
    apply_field_folded,
    fold_conditioning,
    init_field_params,
)
from mofanerf_tpu.ops.bounds import bounded_z_vals, ray_aabb_interval
from mofanerf_tpu.ops.composite import composite
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.sampling import stratified_z_vals
from mofanerf_tpu.render.serve import render_frame_serve, render_rays_bounded

CFG = FieldConfig(depth=8, width=32)
NEAR, FAR = 8.0, 26.0


def _setup(n=16):
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    cond = fold_conditioning(params, jnp.zeros(50), jnp.zeros(30), jnp.zeros(256))
    rng = np.random.default_rng(0)
    ro = jnp.zeros((n, 3))
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    return params, cond, ro, rd


def test_ray_aabb_interval_basic():
    # frontal ray from z=16 into a [-2,2]^3 box: enters at t=14, exits t=18
    ro = jnp.asarray([[0.0, 0, 16], [0, 0, 16], [10, 10, 16]])
    rd = jnp.asarray([[0.0, 0, -1], [0, 0, 1], [0, 0, -1.0]])
    t0, t1, hit = ray_aabb_interval(ro, rd, [-2.0] * 3, [2.0] * 3, NEAR, FAR)
    assert np.asarray(hit).tolist() == [True, False, False]
    np.testing.assert_allclose(float(t0[0]), 14.0, atol=1e-5)
    np.testing.assert_allclose(float(t1[0]), 18.0, atol=1e-5)
    # miss rays collapse to [near, near]
    np.testing.assert_allclose(np.asarray(t0[1:]), NEAR)
    np.testing.assert_allclose(np.asarray(t1[1:]), NEAR)


def test_ray_aabb_interval_clips_to_near_far():
    # camera inside the box: interval starts at near, not at a negative t
    ro = jnp.asarray([[0.0, 0, 0]])
    rd = jnp.asarray([[0.0, 0, -1.0]])
    t0, t1, hit = ray_aabb_interval(ro, rd, [-50.0] * 3, [50.0] * 3, NEAR, FAR)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t0[0]), NEAR)
    np.testing.assert_allclose(float(t1[0]), FAR)


def test_bounded_z_vals_span_and_strata():
    t0 = jnp.asarray([10.0, 12.0])
    t1 = jnp.asarray([14.0, 20.0])
    z = bounded_z_vals(None, t0, t1, 8)
    assert z.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(z[:, 0]), [10.0, 12.0])
    np.testing.assert_allclose(np.asarray(z[:, -1]), [14.0, 20.0])
    assert (np.diff(np.asarray(z), axis=-1) > 0).all()
    # perturbed samples stay inside the interval and keep order on average
    zp = bounded_z_vals(jax.random.PRNGKey(0), t0, t1, 8, perturb=1.0)
    assert (np.asarray(zp) >= 10.0 - 1e-6).all()
    assert (np.asarray(zp) <= 20.0 + 1e-6).all()


def test_bounded_render_matches_dense_when_aabb_covers_range():
    """With an AABB enclosing the full [near, far] range the bounded render
    must equal a plain stratified render of the same field."""
    params, cond, ro, rd = _setup()
    S = 16
    out = render_rays_bounded(
        params, CFG, cond, ro, rd, NEAR, FAR, S,
        aabb_min=(-30.0,) * 3, aabb_max=(30.0,) * 3,
    )
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


def test_bounded_render_miss_rays_are_background():
    params, cond, _, _ = _setup()
    # rays pointing away from a small box: all miss
    ro = jnp.tile(jnp.asarray([[0.0, 0, 16]]), (8, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (8, 1))
    out = render_rays_bounded(params, CFG, cond, ro, rd, NEAR, FAR, 8,
                              aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3)
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)
    outw = render_rays_bounded(params, CFG, cond, ro, rd, NEAR, FAR, 8,
                               aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
                               white_bkgd=True)
    np.testing.assert_allclose(np.asarray(outw["rgb"]), 1.0, atol=1e-6)


def test_frame_serve_auto_compaction_matches_full():
    from mofanerf_tpu.ops.rays import pose_spherical

    params, cond, _, _ = _setup()
    K = jnp.asarray([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(10.0, -5.0, 16.0))[:3]
    kw = dict(near=NEAR, far=FAR, n_samples=8,
              aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3, packet_size=32)
    full = render_frame_serve(params, CFG, cond, 16, 16, K, c2w,
                              hit_fraction=1.0, **kw)
    auto = render_frame_serve(params, CFG, cond, 16, 16, K, c2w,
                              hit_fraction=None, **kw)
    assert full["rgb"].shape == (16, 16, 3)
    np.testing.assert_allclose(np.asarray(auto["rgb"]), np.asarray(full["rgb"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(auto["disp"]), np.asarray(full["disp"]),
                               rtol=1e-5)
    # wide-FOV corners miss the tight box -> compaction actually engaged
    assert (np.asarray(auto["acc"]) == 0).any()


def test_distill_learns_teacher():
    """A few hundred point-distill steps on a tiny teacher must cut the
    loss by a large factor and produce a student whose bounded render
    approaches the teacher's."""
    from mofanerf_tpu.train.distill import DistillConfig, distill, distill_loss

    teacher = init_field_params(jax.random.PRNGKey(3), CFG)
    # give the teacher visible structure: positive density bias
    teacher["sigma"]["alpha"]["b"] = teacher["sigma"]["alpha"]["b"] + 2.0
    tcond = fold_conditioning(teacher, jnp.zeros(50), jnp.zeros(30), jnp.zeros(256))

    dcfg = DistillConfig(depth=4, width=32, n_steps=300, batch=512, lr=3e-3,
                         compute_dtype=jnp.float32)
    state, scfg = distill(teacher, CFG, tcond, dcfg, seed=0)
    assert int(state.step) == 300

    # evaluate the distill loss fresh at the end vs at init
    from mofanerf_tpu.train.distill import init_student, _sample_points
    pts, dirs = _sample_points(jax.random.PRNGKey(99), dcfg, 2048)
    init_state, _ = init_student(jax.random.PRNGKey(0), scfg, dcfg.lr)
    l0, _ = distill_loss(init_state.params, scfg, init_state.cond,
                         teacher, CFG, tcond, pts, dirs)
    l1, _ = distill_loss(state.params, scfg, state.cond,
                         teacher, CFG, tcond, pts, dirs)
    assert float(l1) < 0.3 * float(l0), (float(l0), float(l1))

    # student renders finite images through the serving path
    _, _, ro, rd = _setup()
    out = render_rays_bounded(state.params, scfg, state.cond, ro, rd, NEAR, FAR, 8)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_student_mlp_shapes_and_skip():
    from mofanerf_tpu.models.student import (
        StudentConfig, init_student_params, apply_student, student_param_count,
    )

    cfg = StudentConfig(depth=5, width=64, skip=2, multires=6,
                        compute_dtype=jnp.float32)
    params = init_student_params(jax.random.PRNGKey(0), cfg)
    pe = jax.random.normal(jax.random.PRNGKey(1), (12, cfg.pts_embed_dim))
    de = jax.random.normal(jax.random.PRNGKey(2), (12, cfg.views_embed_dim))
    dirf = de @ params["view"]["w_dirs"]
    rgb, sig = apply_student(params, pe, dirf, cfg)
    assert rgb.shape == (12, 3) and sig.shape == (12, 1)
    assert np.isfinite(np.asarray(rgb)).all()
    # the skip layer consumes [W + pe] inputs
    assert params["layers"][2]["w"].shape[0] == 64 + cfg.pts_embed_dim
    assert student_param_count(params) > 0
    # per-ray dir_feat broadcast matches per-point
    rgb2, sig2 = apply_student(params, pe, dirf[:3], cfg, samples_per_ray=4)
    dirf_rep = jnp.repeat(dirf[:3], 4, axis=0)
    rgb3, sig3 = apply_student(params, pe, dirf_rep, cfg)
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig2), np.asarray(sig3), atol=1e-5)


def test_distill_field_arch_still_works():
    """arch='field' keeps the trunk-based student working end-to-end."""
    from mofanerf_tpu.train.distill import DistillConfig, distill

    teacher = init_field_params(jax.random.PRNGKey(3), CFG)
    tcond = fold_conditioning(teacher, jnp.zeros(50), jnp.zeros(30), jnp.zeros(256))
    dcfg = DistillConfig(arch="field", depth=4, width=32, n_steps=20, batch=256,
                         compute_dtype=jnp.float32)
    state, scfg = distill(teacher, CFG, tcond, dcfg, seed=0)
    assert state.cond is not None
    out = render_rays_bounded(state.params, scfg, state.cond,
                              jnp.zeros((4, 3)), jnp.eye(3)[jnp.asarray([0, 1, 2, 0])],
                              NEAR, FAR, 8)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_bucket_fraction():
    from mofanerf_tpu.ops.sweep import HIT_BUDGET_BUCKETS, bucket_fraction

    assert bucket_fraction(0.0) == 0.25
    assert bucket_fraction(0.25) == 0.25
    assert bucket_fraction(0.2501) == 0.5
    assert bucket_fraction(0.74) == 0.75
    assert bucket_fraction(1.0) == 1.0
    assert bucket_fraction(0.3, buckets=(0.5, 1.0)) == 0.5
    assert HIT_BUDGET_BUCKETS[-1] == 1.0  # auto mode can never drop rays


def test_embed_constants_match_fourier_embed():
    """sin(pts @ A + phase) must reproduce fourier_embed's channels after
    the identity dims, in the exact reference order."""
    from mofanerf_tpu.ops.pallas_serve import _embed_constants

    for mr in (4, 8, 10):
        A, phase = _embed_constants(mr)
        pts = jnp.asarray(np.random.default_rng(mr).uniform(-2, 2, (32, 3)),
                          jnp.float32)
        got = jnp.sin(pts @ jnp.asarray(A) + jnp.asarray(phase))
        want = fourier_embed(pts, mr)[:, 3:]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_render_path_serve_matches_per_frame():
    from mofanerf_tpu.ops.rays import pose_spherical
    from mofanerf_tpu.render.serve import render_path_serve

    params, cond, _, _ = _setup()
    K = jnp.asarray([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]])
    poses = jnp.stack([jnp.asarray(pose_spherical(a, -5.0, 16.0))
                       for a in (0.0, 40.0, 80.0)])
    kw = dict(near=NEAR, far=FAR, n_samples=8,
              aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3)
    batched = render_path_serve(params, CFG, cond, poses, 16, 16, K,
                                packet_size=128, hit_fraction=None, **kw)
    assert batched["rgb"].shape == (3, 16, 16, 3)
    for i in range(3):
        single = render_frame_serve(params, CFG, cond, 16, 16, K,
                                    poses[i][:3], packet_size=128,
                                    hit_fraction=1.0, **kw)
        np.testing.assert_allclose(np.asarray(batched["rgb"][i]),
                                   np.asarray(single["rgb"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched["acc"][i]),
                                   np.asarray(single["acc"]), atol=1e-5)
