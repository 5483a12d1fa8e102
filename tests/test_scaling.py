"""Virtual-mesh scaling curve: the same jitted programs over 1/2/4/8
devices must agree with the single-device result (correctness story for
the multi-chip claims this single-chip environment can't hardware-test).

Numeric note: sharding changes gradient/psum accumulation order, so
"bit-identical" is not a meaningful bar for f32 reductions — the bar here
is tight elementwise tolerance on the loss and the updated parameters,
and exact ray-count accounting per device.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.parallel.mesh import make_mesh
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    RenderConfig,
    init_model_params,
    prepare_conditioning,
    exp_code_for,
)
from mofanerf_tpu.train.state import (
    Batch,
    TrainState,
    create_train_state,
    make_optimizer,
    train_step,
)

SPEC = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=16),
    fine=FieldConfig(depth=8, width=32),
    render=RenderConfig(n_coarse=4, n_importance=4),
    uv_size=128,
)
N_RAYS = 64


def _batch():
    rng = np.random.default_rng(3)
    rd = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return Batch(
        rays_o=jnp.zeros((N_RAYS, 3)),
        rays_d=jnp.asarray(rd),
        target_rgb=jnp.asarray(rng.random((N_RAYS, 3)), jnp.float32),
        shape_code=jnp.ones(50) * 0.1,
        exp_type=jnp.asarray(0, jnp.int32),
        uv_map=jnp.full((128, 128, 3), 0.5),
    )


def _sharded_step(mesh, state, batch):
    rs = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    tx = make_optimizer()
    state = TrainState(
        jax.device_put(state.params, rep),
        jax.device_put(state.opt_state, rep),
        jax.device_put(state.step, rep),
    )
    batch = Batch(
        jax.device_put(batch.rays_o, rs),
        jax.device_put(batch.rays_d, rs),
        jax.device_put(batch.target_rgb, rs),
        jax.device_put(batch.shape_code, rep),
        jax.device_put(batch.exp_type, rep),
        jax.device_put(batch.uv_map, rep),
    )
    step = jax.jit(lambda s, b, k: train_step(s, b, k, SPEC, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(9))
    return new_state, metrics


def test_train_step_scaling_curve():
    state0 = create_train_state(jax.random.PRNGKey(0), SPEC)
    batch = _batch()

    results = {}
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        assert N_RAYS % n_dev == 0
        per_device_rays = N_RAYS // n_dev
        new_state, metrics = _sharded_step(mesh, state0, batch)
        results[n_dev] = (float(metrics["loss"]), new_state.params, per_device_rays)

    base_loss, base_params, _ = results[1]
    for n_dev in (2, 4, 8):
        loss, params, per_dev = results[n_dev]
        assert per_dev == N_RAYS // n_dev
        # psum reduction order changes, values must still agree tightly
        assert abs(loss - base_loss) < 1e-4 * max(1.0, abs(base_loss)), (
            n_dev, loss, base_loss)
        max_err = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(base_params))
        )
        assert max_err < 1e-5, (n_dev, max_err)


def test_render_frame_sharded_scaling_curve():
    from mofanerf_tpu.render.renderer import render_frame, render_frame_sharded
    from mofanerf_tpu.ops.rays import pose_spherical

    params = init_model_params(jax.random.PRNGKey(5), SPEC)
    cond = prepare_conditioning(
        params, SPEC, jnp.ones(50) * 0.1, exp_code_for(params, 0),
        jnp.ones(256) * 0.1,
    )
    H, W = 16, 16
    K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(15.0, -10.0, 16.0))[:3]
    spec = dataclasses.replace(
        SPEC, render=dataclasses.replace(SPEC.render, packet_size=16))

    single = render_frame(params, spec, cond, H, W, K, c2w)
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        out = render_frame_sharded(params, spec, cond, H, W, K, c2w, mesh)
        err = np.abs(np.asarray(out["rgb"]) - np.asarray(single["rgb"]))
        # deterministic render: only fp ordering may differ, and only a
        # little (searchsorted flips tolerated on <5% of pixels)
        assert (err > 2e-3).mean() < 0.05, (n_dev, (err > 2e-3).mean())
        assert err.max() < 0.15, (n_dev, err.max())


@pytest.mark.parametrize("n_model", [2, 4])
def test_tensor_parallel_widths(n_model):
    """Model-axis sharding of the fine width at 2 and 4 ways agrees with
    the replicated forward."""
    from mofanerf_tpu.parallel.mesh import shard_params_rules
    from mofanerf_tpu.render.renderer import render_rays

    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=16),
        fine=FieldConfig(depth=8, width=256),
        render=RenderConfig(n_coarse=4, n_importance=4),
        uv_size=128,
    )
    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    params = init_model_params(jax.random.PRNGKey(1), spec)
    rules = shard_params_rules(params, mesh)
    params_sh = jax.device_put(params, rules)
    cond = prepare_conditioning(
        params_sh, spec, jnp.ones(50) * 0.1, exp_code_for(params_sh, 0),
        jnp.ones(256) * 0.1,
    )
    rng = np.random.default_rng(1)
    n = 32
    ro = jnp.asarray(rng.standard_normal((n, 3)) * 0.1, jnp.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    rs = NamedSharding(mesh, P("data"))
    out = jax.jit(lambda p, c, o, d: render_rays(p, spec, c, o, d))(
        params_sh, cond, jax.device_put(ro, rs), jax.device_put(rd, rs))
    ref = render_rays(params, spec, cond, ro, rd)
    err = np.abs(np.asarray(out["rgb"]) - np.asarray(ref["rgb"]))
    assert (err > 2e-3).mean() < 0.1 and err.max() < 0.15


@pytest.mark.parametrize("n_data", [2, 4, 8])
def test_serve_path_sharded_matches_single(n_data):
    """render_path_serve over a data-sharded mesh must reproduce the
    single-device render exactly (rays are independent; compaction is
    global, so the budget and background scatter are identical)."""
    from mofanerf_tpu.models.student import StudentConfig, init_point_field
    from mofanerf_tpu.ops.rays import pose_spherical
    from mofanerf_tpu.render.serve import render_path_serve

    cfg = StudentConfig(depth=2, width=32, multires=4,
                        compute_dtype=jnp.float32)
    params, cond = init_point_field(jax.random.PRNGKey(11), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0

    poses = np.stack([np.asarray(pose_spherical(a, -10.0, 16.0))
                      for a in (-30.0, 30.0)])
    K = jnp.asarray([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]])
    kw = dict(near=8.0, far=26.0, n_samples=4,
              aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
              packet_size=64, hit_fraction=0.5)

    ref = render_path_serve(params, cfg, cond, poses, 16, 16, K, **kw)
    mesh = make_mesh(n_data=n_data, n_model=1)
    got = render_path_serve(params, cfg, cond, poses, 16, 16, K, mesh=mesh,
                            **kw)
    for k in ("rgb", "acc", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    assert got["rgb"].shape == (2, 16, 16, 3)

    # auto-budgeted compaction (hit_fraction=None) agrees too
    kw_auto = dict(kw, hit_fraction=None)
    ref_a = render_path_serve(params, cfg, cond, poses, 16, 16, K, **kw_auto)
    got_a = render_path_serve(params, cfg, cond, poses, 16, 16, K, mesh=mesh,
                              **kw_auto)
    np.testing.assert_allclose(np.asarray(got_a["rgb"]),
                               np.asarray(ref_a["rgb"]),
                               rtol=1e-5, atol=1e-6)


def test_serve_path_sharded_fused_and_conditioned():
    """The sharded sweep composes with the fused kernel (interpret on CPU)
    and a code-conditioned student."""
    from mofanerf_tpu.models.student import StudentConfig, init_student_params
    from mofanerf_tpu.ops.rays import pose_spherical
    from mofanerf_tpu.render.serve import render_path_serve

    cfg = StudentConfig(depth=2, width=128, multires=4, cond_dim=4,
                        compute_dtype=jnp.float32)
    params = init_student_params(jax.random.PRNGKey(12), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    code = jnp.ones(4) * 0.3

    poses = np.stack([np.asarray(pose_spherical(0.0, -10.0, 16.0))])
    K = jnp.asarray([[37.0, 0, 16.0], [0, 37.0, 16.0], [0, 0, 1.0]])
    kw = dict(near=8.0, far=26.0, n_samples=4,
              aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
              packet_size=256, hit_fraction=1.0)

    ref = render_path_serve(params, cfg, code, poses, 32, 32, K, fused=True,
                            **kw)
    mesh = make_mesh(n_data=4, n_model=1)
    got = render_path_serve(params, cfg, code, poses, 32, 32, K, fused=True,
                            mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-5, atol=1e-6)


def test_sharded_serve_program_cache_reused_across_avatars():
    """Different students AND different (per-avatar tightened) AABBs must
    reuse ONE compiled sharded program — params/cond/aabb are traced
    arguments, not baked constants (remote compiles cost minutes)."""
    from mofanerf_tpu.models.student import StudentConfig, init_point_field
    from mofanerf_tpu.ops.rays import pose_spherical
    from mofanerf_tpu.render import serve
    from mofanerf_tpu.render.serve import render_path_serve

    cfg = StudentConfig(depth=2, width=32, multires=4,
                        compute_dtype=jnp.float32)
    mesh = make_mesh(n_data=2, n_model=1)
    poses = np.stack([np.asarray(pose_spherical(0.0, -10.0, 16.0))])
    K = jnp.asarray([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]])

    serve._SHARDED_SWEEP_CACHE.clear()
    outs = []
    for seed, box in ((0, 2.0), (1, 1.7), (2, 2.3)):
        params, cond = init_point_field(jax.random.PRNGKey(seed), cfg)
        params["sigma"]["b"] = params["sigma"]["b"] + 1.0
        out = render_path_serve(
            params, cfg, cond, poses, 16, 16, K, near=8.0, far=26.0,
            n_samples=4, aabb_min=(-box,) * 3, aabb_max=(box,) * 3,
            packet_size=64, hit_fraction=1.0, mesh=mesh)
        outs.append(np.asarray(out["rgb"]))
    assert len(serve._SHARDED_SWEEP_CACHE) == 1, (
        f"cache fragmented: {len(serve._SHARDED_SWEEP_CACHE)} entries"
    )
    # different avatars must still render differently (not a constant bake)
    assert np.abs(outs[0] - outs[1]).max() > 1e-5
