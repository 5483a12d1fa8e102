"""sigma_activation coherence across every density-consuming path.

A field trained with softplus density must be read with softplus by the
occupancy grid builders, the culled renderer, the bounded serving
renderer, and the distillation teacher — and typos must raise instead of
silently flipping activations (review findings, round 2)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig, init_field_params, fold_conditioning
from mofanerf_tpu.ops.composite import sigma_act
from mofanerf_tpu.ops.occupancy import (
    OccupancyGrid,
    build_occupancy_grid,
    render_rays_occupancy,
)
from mofanerf_tpu.render.serve import render_frame_serve, render_rays_bounded

CFG = FieldConfig(depth=2, width=16, skip=0, xyz_depth=1, multires=4,
                  shape_dim=2, exp_dim=2, tex_dim=2, compute_dtype=jnp.float32)


def _field(bias):
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    params["sigma"]["alpha"]["b"] = params["sigma"]["alpha"]["b"] + bias
    cond = fold_conditioning(params, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2))
    return params, cond


def test_sigma_act_validates():
    assert sigma_act("relu") is jax.nn.relu
    assert sigma_act("softplus") is jax.nn.softplus
    for bad in ("ReLU", "relu ", "", "gelu"):
        with pytest.raises(ValueError):
            sigma_act(bad)


def test_grid_threshold_uses_activated_density():
    # raw sigma ~0.9 everywhere: relu density 0.9 < 1 (empty grid) but
    # softplus(0.9) = 1.24 > 1 (occupied) — the threshold must see the
    # activation the field was trained with
    params, cond = _field(bias=0.0)
    # force raw sigma constant by zeroing the alpha weights
    params["sigma"]["alpha"]["w"] = jnp.zeros_like(params["sigma"]["alpha"]["w"])
    params["sigma"]["alpha"]["b"] = jnp.full_like(params["sigma"]["alpha"]["b"], 0.9)
    g_relu = build_occupancy_grid(params, CFG, cond, resolution=4,
                                  aabb_min=(-1.0,) * 3, aabb_max=(1.0,) * 3)
    g_soft = build_occupancy_grid(params, CFG, cond, resolution=4,
                                  aabb_min=(-1.0,) * 3, aabb_max=(1.0,) * 3,
                                  sigma_activation="softplus")
    assert not bool(g_relu.occ.any())
    assert bool(g_soft.occ.all())


def _test_rays(n=32):
    ro = jnp.tile(jnp.asarray([[0.0, 0, 16.0]]), (n, 1))
    rng = np.random.default_rng(0)
    to = rng.standard_normal((n, 3)) * np.array([0.8, 0.8, 0.1]) - [0, 0, 16]
    rd = jnp.asarray((to / np.linalg.norm(to, axis=-1, keepdims=True))
                     .astype(np.float32))
    return ro, rd


def test_occupancy_render_respects_activation():
    params, cond = _field(bias=-0.5)  # raw sigma straddles 0
    grid = OccupancyGrid(jnp.ones((4, 4, 4), bool),
                         jnp.asarray([-2.0] * 3), jnp.asarray([2.0] * 3))
    ro, rd = _test_rays()
    out_r = render_rays_occupancy(params, CFG, cond, grid, ro, rd, 8.0, 26.0,
                                  16, 8)
    out_s = render_rays_occupancy(params, CFG, cond, grid, ro, rd, 8.0, 26.0,
                                  16, 8, sigma_activation="softplus")
    # softplus leaks density where relu is dead — images must differ
    assert float(jnp.abs(out_s["acc"] - out_r["acc"]).max()) > 1e-4
    assert bool(jnp.isfinite(out_s["rgb"]).all())


def test_bounded_render_respects_activation_and_fused_refuses():
    # deeply negative raw sigma: relu renders (near-)empty while softplus
    # leaks visible density — saturation-proof contrast
    params, cond = _field(bias=-3.0)
    ro, rd = _test_rays()
    aabb = ((-2.0,) * 3, (2.0,) * 3)
    out_r = render_rays_bounded(params, CFG, cond, ro, rd, 8.0, 26.0, 8, *aabb)
    out_s = render_rays_bounded(params, CFG, cond, ro, rd, 8.0, 26.0, 8, *aabb,
                                sigma_activation="softplus")
    assert float(jnp.abs(out_s["acc"] - out_r["acc"]).max()) > 1e-4

    from mofanerf_tpu.models.student import StudentConfig, init_point_field

    scfg = StudentConfig(depth=2, width=32, multires=4,
                         compute_dtype=jnp.float32)
    sp, sc = init_point_field(jax.random.PRNGKey(1), scfg)
    K = jnp.asarray([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]])
    c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 16.0]])
    with pytest.raises(ValueError, match="relu-only"):
        render_frame_serve(sp, scfg, sc, 16, 16, K, c2w, n_samples=4,
                           aabb_min=aabb[0], aabb_max=aabb[1],
                           packet_size=256, hit_fraction=1.0, fused=True,
                           sigma_activation="softplus")


def test_distill_teacher_activation_threads():
    from mofanerf_tpu.train.distill import _field_outputs

    params, cond = _field(bias=-0.5)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.asarray([[0.0, 0, -1.0]]), (64, 1))
    _, sig_r = _field_outputs(params, CFG, cond, pts, dirs)
    _, sig_s = _field_outputs(params, CFG, cond, pts, dirs, "softplus")
    assert float(jnp.abs(sig_s - sig_r).max()) > 1e-4
    # softplus is strictly positive; relu has dead zeros here
    assert float(sig_s.min()) > 0.0


def test_auto_budget_under_jit_raises_clearly():
    from mofanerf_tpu.models.student import StudentConfig, init_point_field
    from mofanerf_tpu.ops.rays import pose_spherical

    scfg = StudentConfig(depth=2, width=16, multires=4,
                         compute_dtype=jnp.float32)
    sp, sc = init_point_field(jax.random.PRNGKey(3), scfg)
    K = jnp.asarray([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]])

    @jax.jit
    def frame(c2w):
        return render_frame_serve(sp, scfg, sc, 16, 16, K, c2w, n_samples=4,
                                  aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
                                  packet_size=256)["rgb"]  # default None budget

    with pytest.raises(ValueError, match="hit_fraction"):
        frame(jnp.asarray(pose_spherical(0.0, -10.0, 16.0))[:3])
