"""Code-conditioned student: fold correctness, serving parity, and
expression-bank distillation.

The conditioned student is the serving-path answer to the reference's
expression rigging (run_fit.py:379-431 sweeps expression latents through
the full field): one distilled student covers the whole bank because the
code folds into layer biases (models/student.py::fold_student_code), so
the hot path — including the fused Pallas kernel — is byte-identical to
an unconditioned student's.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.models.student import (
    StudentConfig,
    apply_student,
    fold_student_code,
    init_student_params,
    point_apply,
)
from mofanerf_tpu.ops.embed import fourier_embed

CFG = StudentConfig(depth=3, width=32, multires=4, cond_dim=6,
                    compute_dtype=jnp.float32)


def _inputs(n=64, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(k2, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pe = fourier_embed(pts, CFG.multires)
    de = fourier_embed(dirs, CFG.multires_views)
    return pe, de


def test_fold_zero_code_is_identity():
    params = init_student_params(jax.random.PRNGKey(0), CFG)
    folded = fold_student_code(params, jnp.zeros(CFG.cond_dim))
    assert "cond" not in folded
    np.testing.assert_allclose(np.asarray(folded["input"]["b"]),
                               np.asarray(params["input"]["b"]), atol=1e-7)
    for a, b in zip(folded["layers"], params["layers"]):
        np.testing.assert_allclose(np.asarray(a["b"]), np.asarray(b["b"]),
                                   atol=1e-7)


def test_fold_matches_explicit_concat_math():
    """b0 + code @ w_in must equal running concat([pe, code]) through a
    weight matrix stacked from [w_pts; w_in] — the concat-linearity identity
    the whole block-parameter design rests on."""
    params = init_student_params(jax.random.PRNGKey(1), CFG)
    code = jax.random.normal(jax.random.PRNGKey(2), (CFG.cond_dim,))
    pe, de = _inputs()
    dirf = de @ params["view"]["w_dirs"]

    folded = fold_student_code(params, code)
    rgb_f, sig_f = apply_student(folded, pe, dirf, CFG)

    # explicit concat reference for the input layer; trunk injections are
    # additive biases by construction, reproduced manually here
    w_cat = jnp.concatenate([params["input"]["w"], params["cond"]["w_in"]], 0)
    x_cat = jnp.concatenate([pe, jnp.tile(code[None], (pe.shape[0], 1))], 1)
    h = jax.nn.relu(x_cat @ w_cat + params["input"]["b"])
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(h @ layer["w"] + layer["b"]
                        + code @ params["cond"]["w_layers"][i])
    sig_ref = h @ params["sigma"]["w"] + params["sigma"]["b"]
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_ref),
                               rtol=1e-5, atol=1e-5)


def test_point_apply_folds_code():
    params = init_student_params(jax.random.PRNGKey(3), CFG)
    # make trunk injections nonzero so the test is not vacuous
    params["cond"]["w_layers"] = jax.random.normal(
        jax.random.PRNGKey(4), params["cond"]["w_layers"].shape) * 0.1
    code = jax.random.normal(jax.random.PRNGKey(5), (CFG.cond_dim,))
    pe, de = _inputs()
    dirf = de @ params["view"]["w_dirs"]

    rgb_a, sig_a = point_apply(params, code, pe, dirf, CFG)
    rgb_b, sig_b = apply_student(fold_student_code(params, code), pe, dirf, CFG)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=1e-6)

    # different codes must produce different fields (w_in is nonzero init)
    _, sig_c = point_apply(params, -code, pe, dirf, CFG)
    assert np.abs(np.asarray(sig_a) - np.asarray(sig_c)).max() > 1e-4


def test_code_gradients_flow_through_fold():
    params = init_student_params(jax.random.PRNGKey(6), CFG)
    pe, de = _inputs(32)
    dirf = de @ params["view"]["w_dirs"]

    def loss(p, code):
        rgb, sig = point_apply(p, code, pe, dirf, CFG)
        return jnp.sum(rgb ** 2) + jnp.sum(sig ** 2)

    g_params, g_code = jax.grad(loss, argnums=(0, 1))(
        params, jnp.ones(CFG.cond_dim) * 0.3)
    assert float(jnp.abs(g_code).max()) > 0
    assert float(jnp.abs(g_params["cond"]["w_in"]).max()) > 0
    # zero-init trunk injections still receive gradient (outer product of
    # code and upstream bias grads)
    assert float(jnp.abs(g_params["cond"]["w_layers"]).max()) > 0


def test_fused_kernel_serves_folded_conditioned_student():
    import pytest

    from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused
    from mofanerf_tpu.render.serve import render_rays_bounded

    cfg = StudentConfig(depth=4, width=128, multires=8, cond_dim=6,
                        compute_dtype=jnp.float32)
    params = init_student_params(jax.random.PRNGKey(7), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    params["cond"]["w_layers"] = jax.random.normal(
        jax.random.PRNGKey(8), params["cond"]["w_layers"].shape) * 0.05
    code = jax.random.normal(jax.random.PRNGKey(9), (cfg.cond_dim,)) * 0.5

    n = 256
    ro = jnp.tile(jnp.asarray([[0.0, 0, 16.0]]), (n, 1))
    rng = np.random.default_rng(0)
    to = rng.standard_normal((n, 3)) * np.array([1.5, 1.5, 0.2]) - [0, 0, 16]
    rd = jnp.asarray((to / np.linalg.norm(to, axis=-1, keepdims=True))
                     .astype(np.float32))
    aabb = ((-2.0,) * 3, (2.0,) * 3)

    # unfolded params + code through the XLA path == folded params through
    # the fused kernel
    ref = render_rays_bounded(params, cfg, code, ro, rd, 8.0, 26.0, 8, *aabb)
    folded = fold_student_code(params, code)
    got = render_rays_bounded_fused(folded, cfg, ro, rd, 8.0, 26.0, 8, *aabb,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["acc"]), np.asarray(ref["acc"]),
                               rtol=1e-4, atol=1e-4)

    # the kernel refuses unfolded conditioned params
    with pytest.raises(AssertionError):
        render_rays_bounded_fused(params, cfg, ro, rd, 8.0, 26.0, 8, *aabb,
                                  interpret=True)


def test_render_frame_serve_accepts_code_as_cond():
    from mofanerf_tpu.render.serve import render_frame_serve

    cfg = StudentConfig(depth=2, width=32, multires=4, cond_dim=6,
                        compute_dtype=jnp.float32)
    params = init_student_params(jax.random.PRNGKey(10), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    code = jnp.ones(cfg.cond_dim) * 0.2
    K = jnp.asarray([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]])
    c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 16.0]])
    out = render_frame_serve(
        params, cfg, code, 32, 32, K, c2w, n_samples=8,
        aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
        packet_size=256, hit_fraction=1.0,
    )
    assert out["rgb"].shape == (32, 32, 3)
    assert bool(jnp.isfinite(out["rgb"]).all())


def test_distill_expressions_learns_code_control():
    """Tiny end-to-end: a hand-built teacher whose density radius depends on
    the expression code; after conditioned distillation the student's
    density must track the code the same way."""
    from mofanerf_tpu.models.ism import init_ism_params, modulate_expression
    from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig
    from mofanerf_tpu.train.distill import (
        DistillConfig,
        distill_expressions,
        student_code,
    )
    from mofanerf_tpu.models.field import init_field_params

    exp_dim = 4
    fine_cfg = FieldConfig(depth=2, width=32, skip=0, xyz_depth=1,
                           multires=4, exp_dim=exp_dim, shape_dim=4,
                           tex_dim=4, compute_dtype=jnp.float32)
    spec = MoFaNeRF(coarse=fine_cfg, fine=fine_cfg,
                    render=RenderConfig(n_coarse=4, n_importance=4),
                    shape_dim=4, exp_dim=exp_dim, tex_dim=4, uv_size=128)

    fine_params = init_field_params(jax.random.PRNGKey(0), fine_cfg)
    # amplify the expression pathway so the teacher family is genuinely
    # distinct across codes (a random-init field is nearly code-agnostic)
    fine_params["xyz"]["w_exp"] = fine_params["xyz"]["w_exp"] * 8.0
    model_params = {
        "fine": fine_params,
        "ism": init_ism_params(jax.random.PRNGKey(1), in_dim=4, width=16,
                               depth=2, out_dim=exp_dim),
        "exp_codes": jnp.asarray([[2.0, 0, 0, 0], [0, 2.0, 0, 0]]),
    }

    dcfg = DistillConfig(depth=2, width=32, multires=4, cond_dim=exp_dim,
                         n_steps=400, batch=512, lr=3e-3,
                         aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
                         compute_dtype=jnp.float32)
    st, scfg = distill_expressions(
        model_params, spec, jnp.zeros(4), jnp.zeros(4), dcfg,
        exp_ids=[0, 1], seed=0,
    )
    assert isinstance(scfg, StudentConfig) and scfg.cond_dim == exp_dim
    assert int(st.step) == dcfg.n_steps

    # teacher and student must agree per-expression better than the
    # cross-expression disagreement (i.e. the code input actually steers
    # the student toward the right member of the family)
    pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                             minval=-1.5, maxval=1.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0, -1.0]]), (256, 1))
    from mofanerf_tpu.train.distill import _field_outputs
    from mofanerf_tpu.models.field import fold_conditioning

    sigs_t, sigs_s = [], []
    for e in (0, 1):
        raw = model_params["exp_codes"][e]
        code = student_code(model_params, jnp.zeros(4), raw)
        mod = modulate_expression(model_params["ism"], jnp.zeros(4), raw)
        cond_t = fold_conditioning(model_params["fine"], jnp.zeros(4), mod,
                                   jnp.zeros(4))
        _, sig_t = _field_outputs(model_params["fine"], fine_cfg, cond_t,
                                  pts, dirs)
        _, sig_s = _field_outputs(st.params, scfg, code, pts, dirs)
        sigs_t.append(np.log1p(np.asarray(sig_t)))
        sigs_s.append(np.log1p(np.asarray(sig_s)))

    def err(s, t):
        return np.abs(sigs_s[s] - sigs_t[t]).mean()

    cross = np.abs(sigs_t[0] - sigs_t[1]).mean()
    # w_exp is amplified 8x so the family separates; branching on cross
    # would make the test vacuous under a conditioning regression
    assert cross > 1e-3, f"teacher expressions do not separate ({cross=})"
    # code-specificity: student(code_e) is closer to teacher_e than to
    # the other expression's teacher — the code input steers the field
    assert err(0, 0) < err(0, 1) and err(1, 1) < err(1, 0), (
        f"student ignores the code: {err(0,0)=} {err(0,1)=} "
        f"{err(1,1)=} {err(1,0)=}"
    )
    # and the student's own code-induced spread matches the teacher's
    # within a factor of 3 (it learned the family, not one average)
    spread_s = np.abs(sigs_s[0] - sigs_s[1]).mean()
    assert spread_s > cross / 3, f"{spread_s=} vs teacher {cross=}"


def test_student_artifact_roundtrip(tmp_path):
    """save_student/load_student: one-file deployable artifact preserves
    params (incl. the cond block) and the exact StudentConfig."""
    from mofanerf_tpu.train.distill import load_student, save_student

    for cfg in (CFG, StudentConfig(depth=2, width=16, multires=4,
                                   compute_dtype=jnp.bfloat16)):
        params = init_student_params(jax.random.PRNGKey(20), cfg)
        path = str(tmp_path / f"student_{cfg.cond_dim}.npz")
        save_student(path, params, cfg)
        loaded, cfg2 = load_student(path)
        assert cfg2 == cfg
        ref = jax.tree_util.tree_leaves(params)
        got = jax.tree_util.tree_leaves(loaded)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_student_artifact_provenance(tmp_path):
    """Artifacts record the distillation AABB/near-far + identity; loaders
    get them back verbatim (and {} for artifacts saved without one)."""
    from mofanerf_tpu.train.distill import (
        DistillConfig,
        distill_provenance,
        load_student,
        save_student,
    )

    cfg = StudentConfig(depth=2, width=16, multires=4,
                        compute_dtype=jnp.float32)
    params = init_student_params(jax.random.PRNGKey(3), cfg)
    dcfg = DistillConfig(aabb_min=(-1.0, -2.0, -3.0), aabb_max=(1.0, 2.0, 3.0),
                         near=4.0, far=9.0, n_steps=7)
    prov = distill_provenance(dcfg, person=5, expression=2, avatar_ids=None)
    path = str(tmp_path / "student.npz")
    save_student(path, params, cfg, provenance=prov)
    _, cfg2, prov2 = load_student(path, with_provenance=True)
    assert cfg2 == cfg
    assert prov2["aabb_min"] == [-1.0, -2.0, -3.0]
    assert prov2["aabb_max"] == [1.0, 2.0, 3.0]
    assert prov2["near"] == 4.0 and prov2["far"] == 9.0
    assert prov2["person"] == 5 and prov2["expression"] == 2
    assert "avatar_ids" not in prov2  # None fields are dropped

    # default 2-tuple load still works, and prov-less artifacts load as {}
    save_student(path, params, cfg)
    p3, cfg3, prov3 = load_student(path, with_provenance=True)
    assert prov3 == {} and cfg3 == cfg


def test_distill_avatars_learns_identity_control():
    """Two 'avatars' (distinct shape codes driving an amplified shape
    pathway) distill into ONE student whose [shape; exp] code steers it to
    the right member of the family."""
    from mofanerf_tpu.models.ism import init_ism_params
    from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig
    from mofanerf_tpu.train.distill import (
        DistillConfig,
        _field_outputs,
        avatar_code,
        distill_avatars,
    )
    from mofanerf_tpu.models.field import fold_conditioning, init_field_params
    from mofanerf_tpu.models.ism import modulate_expression

    sdim = edim = 4
    fine_cfg = FieldConfig(depth=2, width=32, skip=0, xyz_depth=1,
                           multires=4, exp_dim=edim, shape_dim=sdim,
                           tex_dim=4, compute_dtype=jnp.float32)
    spec = MoFaNeRF(coarse=fine_cfg, fine=fine_cfg,
                    render=RenderConfig(n_coarse=4, n_importance=4),
                    shape_dim=sdim, exp_dim=edim, tex_dim=4, uv_size=128)
    fine_params = init_field_params(jax.random.PRNGKey(0), fine_cfg)
    # amplify the SHAPE pathway so identities are genuinely distinct
    fine_params["sigma"]["w_code0"] = fine_params["sigma"]["w_code0"] * 8.0
    model_params = {
        "fine": fine_params,
        "ism": init_ism_params(jax.random.PRNGKey(1), in_dim=sdim, width=16,
                               depth=2, out_dim=edim),
        "exp_codes": jnp.asarray([[1.0, 0, 0, 0]]),
    }
    avatars = [(jnp.asarray([2.0, 0, 0, 0]), jnp.zeros(4)),
               (jnp.asarray([0, 2.0, 0, 0]), jnp.zeros(4))]

    dcfg = DistillConfig(depth=2, width=32, multires=4,
                         cond_dim=sdim + edim, n_steps=400, batch=512,
                         lr=3e-3, aabb_min=(-2.0,) * 3, aabb_max=(2.0,) * 3,
                         compute_dtype=jnp.float32)
    st, scfg = distill_avatars(model_params, spec, avatars, dcfg,
                               exp_ids=[0], seed=0)
    assert scfg.cond_dim == sdim + edim

    pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                             minval=-1.5, maxval=1.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0, -1.0]]), (256, 1))
    raw0 = model_params["exp_codes"][0]
    sigs_t, sigs_s = [], []
    for shape, _tex in avatars:
        mod = modulate_expression(model_params["ism"], shape, raw0)
        cond_t = fold_conditioning(model_params["fine"], shape, mod,
                                   jnp.zeros(4))
        _, sig_t = _field_outputs(model_params["fine"], fine_cfg, cond_t,
                                  pts, dirs)
        code = avatar_code(model_params, shape, raw0)
        _, sig_s = _field_outputs(st.params, scfg, code, pts, dirs)
        sigs_t.append(np.log1p(np.asarray(sig_t)))
        sigs_s.append(np.log1p(np.asarray(sig_s)))

    def err(s, t):
        return np.abs(sigs_s[s] - sigs_t[t]).mean()

    cross = np.abs(sigs_t[0] - sigs_t[1]).mean()
    # the fixture amplifies w_code0 by 8x precisely so the teachers separate
    # — a non-separating family would make every assertion below vacuous
    assert cross > 1e-3, f"teacher identities do not separate ({cross=})"
    assert err(0, 0) < err(0, 1) and err(1, 1) < err(1, 0), (
        f"student ignores the avatar code: {err(0,0)=} {err(0,1)=} "
        f"{err(1,1)=} {err(1,0)=}"
    )
    spread_s = np.abs(sigs_s[0] - sigs_s[1]).mean()
    assert spread_s > cross / 3, f"{spread_s=} vs teacher {cross=}"
