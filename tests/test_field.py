"""Field network tests.

The key test here rebuilds the reference's concat-based forward
(models/model.py:121-137 + skipMLP :202-230) as an independent NumPy oracle
from the SAME block parameters, verifying that the folded TPU formulation is
mathematically identical to the reference architecture.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    apply_field,
    fold_conditioning,
    apply_field_folded,
    field_param_count,
)
from mofanerf_tpu.models.ism import init_ism_params, apply_ism, modulate_expression
from mofanerf_tpu.ops.embed import fourier_embed


CFG = FieldConfig(depth=8, width=64, skip=4, xyz_depth=3)


def _np(p):
    return jax.tree_util.tree_map(np.asarray, p)


def oracle_forward(params, pts_embed, exp, shape, tex, dirs_embed):
    """Concat-based reference forward, NumPy."""
    relu = lambda v: np.maximum(v, 0)
    p = _np(params)

    # xyzEncode: Linear0 over concat([pts_embed, exp]) then xyz_depth layers
    x = p["xyz"]
    h = relu(pts_embed @ x["w_pts"] + exp @ x["w_exp"] + x["b"])
    for l in x["layers"]:
        h = relu(h @ l["w"] + l["b"])
    xyz_code = h

    def trunk(t, code, feat):
        # x = concat([code, feat]); linears1 = L0 + skip mid layers
        h = relu(code @ t["w_code0"] + feat @ t["w_feat0"] + t["b0"])
        for l in t["mid"]:
            h = relu(h @ l["w"] + l["b"])
        # skip: concat([x, h]) = [code, feat, h]
        h = relu(
            code @ t["w_skip_code"] + feat @ t["w_skip_feat"] + h @ t["w_skip_h"] + t["b_skip"]
        )
        for l in t["post"]:
            h = relu(h @ l["w"] + l["b"])
        return h

    B = pts_embed.shape[0]
    code_s = np.broadcast_to(shape, (B, shape.shape[-1]))
    sigma_feat = trunk(p["sigma"], code_s, xyz_code)
    alpha = sigma_feat @ p["sigma"]["alpha"]["w"] + p["sigma"]["alpha"]["b"]

    code_t = np.broadcast_to(tex, (B, tex.shape[-1]))
    rgb_feat = trunk(p["rgb"], code_t, sigma_feat)

    v = p["view"]
    view_feat = relu(dirs_embed @ v["w_dirs"] + rgb_feat @ v["w_feat"] + v["b"])
    rgb = view_feat @ v["rgb"]["w"] + v["rgb"]["b"]
    return rgb, alpha


def test_folded_matches_concat_oracle():
    key = jax.random.PRNGKey(0)
    params = init_field_params(key, CFG)
    # Scale weights to make the net contracting: an untrained relu-gain net
    # amplifies fp rounding exponentially with depth, which would mask the
    # structural comparison this test is about.
    params = jax.tree_util.tree_map(lambda w: w * 0.3, params)
    rng = np.random.default_rng(5)
    N = 13
    pts = rng.standard_normal((N, 3)).astype(np.float32)
    dirs = rng.standard_normal((N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    shape = rng.standard_normal(50).astype(np.float32)
    exp = rng.standard_normal(30).astype(np.float32)
    tex = rng.standard_normal(256).astype(np.float32)

    raw_rgb, raw_sigma = apply_field(
        params, jnp.asarray(pts), jnp.asarray(dirs),
        jnp.asarray(shape), jnp.asarray(exp), jnp.asarray(tex), CFG,
    )

    pe = np.asarray(fourier_embed(jnp.asarray(pts), CFG.multires))
    de = np.asarray(fourier_embed(jnp.asarray(dirs), CFG.multires_views))
    rgb_o, alpha_o = oracle_forward(params, pe, exp, shape, tex, de)

    np.testing.assert_allclose(np.asarray(raw_rgb), rgb_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(raw_sigma), alpha_o, rtol=1e-4, atol=1e-4)


def test_fold_is_per_frame_constant():
    """fold_conditioning output must not depend on points — one fold per frame."""
    key = jax.random.PRNGKey(1)
    params = init_field_params(key, CFG)
    shape = jnp.ones(50)
    exp = jnp.ones(30) * 0.5
    tex = jnp.ones(256) * 0.1
    cond = fold_conditioning(params, shape, exp, tex)
    assert cond["xyz_b"].shape == (CFG.width,)
    assert cond["sigma_b0"].shape == (CFG.width,)
    assert cond["rgb_bskip"].shape == (CFG.width,)


def test_param_count_reference_dims():
    """Coarse (8x256) and fine (10x1024) configs build and have sane sizes."""
    coarse = init_field_params(jax.random.PRNGKey(0), FieldConfig(depth=8, width=256))
    fine = init_field_params(jax.random.PRNGKey(0), FieldConfig(depth=10, width=1024))
    n_coarse = field_param_count(coarse)
    n_fine = field_param_count(fine)
    # fine trunk has 10 layers at 1024 wide: must dwarf coarse
    assert n_fine > 10 * n_coarse
    # rough magnitude: coarse ~ 1.1M, fine ~ 15M+
    assert 0.5e6 < n_coarse < 3e6
    assert 10e6 < n_fine < 40e6


def test_field_jits_and_grads():
    params = init_field_params(jax.random.PRNGKey(2), CFG)
    pts = jnp.ones((8, 3)) * 0.1
    dirs = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (8, 1))
    shape, exp, tex = jnp.ones(50), jnp.ones(30), jnp.ones(256)

    @jax.jit
    def loss(p, s):
        rgb, sig = apply_field(p, pts, dirs, s, exp, tex, CFG)
        return jnp.sum(rgb**2) + jnp.sum(sig**2)

    g = jax.grad(loss, argnums=(0, 1))(params, shape)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient must flow into the shape code (needed by the fitting loop)
    assert np.abs(np.asarray(g[1])).sum() > 0


def test_ism_modulation():
    ism = init_ism_params(jax.random.PRNGKey(3))
    shape = jnp.ones(50) * 0.2
    scale, bias = apply_ism(ism, shape)
    assert scale.shape == (30,) and bias.shape == (30,)
    exp = jnp.ones(30)
    mod = modulate_expression(ism, shape, exp)
    np.testing.assert_allclose(np.asarray(mod), np.asarray(scale * exp + bias), rtol=1e-6)


def test_bf16_compute_close_to_f32():
    cfg16 = FieldConfig(depth=8, width=64, skip=4, compute_dtype=jnp.bfloat16)
    params = init_field_params(jax.random.PRNGKey(4), CFG)
    pts = jnp.asarray(np.random.default_rng(6).standard_normal((32, 3)), jnp.float32) * 0.3
    dirs = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (32, 1))
    s, e, t = jnp.ones(50) * 0.1, jnp.ones(30) * 0.1, jnp.ones(256) * 0.1
    rgb32, sig32 = apply_field(params, pts, dirs, s, e, t, CFG)
    rgb16, sig16 = apply_field(params, pts, dirs, s, e, t, cfg16)
    np.testing.assert_allclose(
        np.asarray(rgb16, np.float32), np.asarray(rgb32), atol=0.15
    )
