"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.parallel.mesh import make_mesh, ray_sharding, replicated, shard_params_rules
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    RenderConfig,
    init_model_params,
    prepare_conditioning,
    render_rays,
    exp_code_for,
)

SPEC = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=32),
    fine=FieldConfig(depth=8, width=256),  # width sharded over model axis
    render=RenderConfig(n_coarse=8, n_importance=8),
    uv_size=128,
)


def test_virtual_mesh_available():
    assert jax.device_count() == 8


def _assert_close_modulo_sample_flips(a, b, atol=2e-3, frac=0.1, hard_max=0.15):
    """Partition-dependent fp accumulation can flip occasional searchsorted
    indices in the importance sampler (discontinuous in its inputs), visibly
    moving isolated samples on a chaotic random-init field. Require the bulk
    of pixels to match tightly and bound the outliers."""
    err = np.abs(np.asarray(a) - np.asarray(b))
    assert (err > atol).mean() < frac, f"too many mismatches: {(err > atol).mean():.3f}"
    assert err.max() < hard_max, f"large deviation: {err.max():.4f}"


def test_data_parallel_render_matches_single():
    mesh = make_mesh(n_data=8, n_model=1)
    params = init_model_params(jax.random.PRNGKey(0), SPEC)
    cond = prepare_conditioning(
        params, SPEC, jnp.ones(50) * 0.1, exp_code_for(params, 0), jnp.ones(256) * 0.1
    )
    rng = np.random.default_rng(0)
    n = 64
    ro = jnp.asarray(rng.standard_normal((n, 3)) * 0.1, jnp.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    single = render_rays(params, SPEC, cond, ro, rd)

    rs = ray_sharding(mesh)
    rep = replicated(mesh)
    f = jax.jit(
        lambda p, c, o, d: render_rays(p, SPEC, c, o, d),
        in_shardings=(rep, rep, rs, rs),
    )
    sharded = f(params, cond, jax.device_put(ro, rs), jax.device_put(rd, rs))
    _assert_close_modulo_sample_flips(sharded["rgb"], single["rgb"])


def test_tensor_parallel_fine_field():
    """2-way model sharding of the fine field width x 4-way data sharding."""
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = init_model_params(jax.random.PRNGKey(1), SPEC)
    rules = shard_params_rules(params, mesh)
    # fine hidden weights got a model-sharded spec
    fine_spec = rules["fine"]["sigma"]["mid"][0]["w"].spec
    assert fine_spec == P(None, "model")
    # coarse stays replicated (width 32 < 128)
    assert rules["coarse"]["sigma"]["mid"][0]["w"].spec == P()

    params_sharded = jax.device_put(params, rules)
    cond = prepare_conditioning(
        params_sharded, SPEC, jnp.ones(50) * 0.1,
        exp_code_for(params_sharded, 0), jnp.ones(256) * 0.1,
    )
    rng = np.random.default_rng(1)
    n = 32
    ro = jnp.asarray(rng.standard_normal((n, 3)) * 0.1, jnp.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    rs = NamedSharding(mesh, P("data"))

    out = jax.jit(lambda p, c, o, d: render_rays(p, SPEC, c, o, d))(
        params_sharded, cond, jax.device_put(ro, rs), jax.device_put(rd, rs)
    )
    ref = render_rays(params, SPEC, cond, ro, rd)
    _assert_close_modulo_sample_flips(out["rgb"], ref["rgb"])


def test_shard_rules_exact_leaf_policy():
    """The TP policy is declarative: under 2-way model sharding, EXACTLY the
    fine field's hidden weight matrices / biases shard — by leaf name, not
    by shape heuristics (VERDICT r2 #8). The tiny heads (alpha W->1, view
    rgb W/2->3), the whole coarse net, codes, ISM, and the texture encoder
    stay replicated."""
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_model_params(jax.random.PRNGKey(2), SPEC)
    rules = shard_params_rules(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(rules)[0]
    sharded_paths = sorted(
        jax.tree_util.keystr(kp) for kp, s in flat if s.spec != P()
    )
    # every sharded leaf lives under 'fine'
    assert all(p.startswith("['fine']") for p in sharded_paths), sharded_paths

    def expect_trunk(name):
        out = [f"['fine']['{name}']['b0']", f"['fine']['{name}']['b_skip']",
               f"['fine']['{name}']['w_code0']", f"['fine']['{name}']['w_feat0']",
               f"['fine']['{name}']['w_skip_code']",
               f"['fine']['{name}']['w_skip_feat']",
               f"['fine']['{name}']['w_skip_h']"]
        for lst in ("mid", "post"):
            n = len(SPEC.fine.__class__ and params["fine"][name][lst])
            for i in range(n):
                out += [f"['fine']['{name}']['{lst}'][{i}]['b']",
                        f"['fine']['{name}']['{lst}'][{i}]['w']"]
        return out

    expected = (
        ["['fine']['xyz']['b']", "['fine']['xyz']['w_exp']",
         "['fine']['xyz']['w_pts']"]
        + [f"['fine']['xyz']['layers'][{i}]['b']" for i in range(3)]
        + [f"['fine']['xyz']['layers'][{i}]['w']" for i in range(3)]
        + expect_trunk("sigma") + expect_trunk("rgb")
        + ["['fine']['view']['b']", "['fine']['view']['w_dirs']",
           "['fine']['view']['w_feat']"]
    )
    assert sharded_paths == sorted(expected), (
        set(sharded_paths) ^ set(expected)
    )
    # weight matrices shard the OUTPUT dim; biases shard their only dim
    assert rules["fine"]["sigma"]["w_feat0"].spec == P(None, "model")
    assert rules["fine"]["sigma"]["b0"].spec == P("model")
    # heads replicate
    assert rules["fine"]["sigma"]["alpha"]["w"].spec == P()
    assert rules["fine"]["view"]["rgb"]["w"].spec == P()


def test_render_frame_sharded_matches_single():
    from mofanerf_tpu.render.renderer import render_frame, render_frame_sharded
    from mofanerf_tpu.ops.rays import pose_spherical

    mesh = make_mesh(n_data=8, n_model=1)
    params = init_model_params(jax.random.PRNGKey(5), SPEC)
    cond = prepare_conditioning(
        params, SPEC, jnp.ones(50) * 0.1, exp_code_for(params, 0), jnp.ones(256) * 0.1
    )
    H, W = 12, 12
    K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(15.0, -10.0, 16.0))[:3]
    import dataclasses
    spec = dataclasses.replace(SPEC, render=dataclasses.replace(SPEC.render, packet_size=16))
    single = render_frame(params, spec, cond, H, W, K, c2w)
    sharded = render_frame_sharded(params, spec, cond, H, W, K, c2w, mesh)
    assert sharded["rgb"].shape == (H, W, 3)
    _assert_close_modulo_sample_flips(sharded["rgb"], single["rgb"])
