"""Per-avatar field distillation: teacher (10x1024 conditioned fine field)
-> small student field for the serving path (render/serve.py).

The serving analog of the reference's offline "bake a deployable artifact"
stages (render_refine_trainSet.py renders a corpus once so RefineNet can
serve cheaply): here the expensive conditioned field is compressed ONCE
per (identity, expression, texture) into a student whose render cost fits
the latency budget, and quality is measured, not assumed.

Design:
- The student reuses the exact block-parameter field machinery
  (models/field.py) at smaller dims with 1-dim conditioning codes folded
  to plain biases — so every renderer, converter, and test that works on
  a field works on a student unchanged.
- Distillation is in POINT space: batches of (x, d) pairs, student matches
  the teacher's activated outputs. RGB error is weighted by the teacher's
  local opacity (rgb only matters where mass is); density matches in
  log1p space (sigma spans orders of magnitude). Points mix uniform-in-
  AABB coverage with samples along random view rays (matching the
  distribution rendering will query).
- One jitted step; the teacher forward runs under stop_gradient inside
  the same program (bf16 on the MXU), so distillation itself runs at
  ~teacher-training speed with zero host traffic.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.models.student import (
    StudentConfig,
    init_point_field,
    point_apply,
    refold_cond,
)
from mofanerf_tpu.ops.bounds import DEFAULT_AABB_MAX, DEFAULT_AABB_MIN
from mofanerf_tpu.ops.embed import fourier_embed

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    arch: str = "mlp"             # "mlp" (lean StudentConfig) | "field"
    depth: int = 4
    width: int = 128
    skip: int = -1                # mlp arch: pe re-injection layer (-1 off)
    multires: int = 0             # 0 = inherit the teacher's band count
    cond_dim: int = 0             # >0 (mlp arch): code-conditioned student —
                                  # one distillation covers the whole
                                  # expression bank (distill_expressions)
    n_steps: int = 2000
    batch: int = 32768
    lr: float = 1e-3
    ray_frac: float = 0.5         # fraction of points drawn along view rays
    cam_radius: float = 16.0      # ray origins orbit the head at this radius
    near: float = 8.0
    far: float = 26.0
    aabb_min: Tuple[float, float, float] = DEFAULT_AABB_MIN
    aabb_max: Tuple[float, float, float] = DEFAULT_AABB_MAX
    teacher_sigma_activation: str = "relu"  # match the teacher's TRAINING
                                  # activation (RenderConfig.sigma_activation)
                                  # — the student itself always serves relu
    compute_dtype: Any = jnp.bfloat16

    def student_config(self, teacher: FieldConfig):
        """Student field: by default the lean unconditioned MLP
        (models/student.py); arch='field' keeps the trunk architecture with
        degenerate (1-dim) conditioning for apples-to-apples comparisons."""
        mr = self.multires or teacher.multires
        if self.arch == "mlp":
            return StudentConfig(
                depth=self.depth, width=self.width, skip=self.skip,
                multires=mr, multires_views=teacher.multires_views,
                cond_dim=self.cond_dim, compute_dtype=self.compute_dtype,
            )
        assert self.cond_dim == 0, "conditioned students use arch='mlp'"
        return FieldConfig(
            depth=self.depth, width=self.width,
            multires=mr, multires_views=teacher.multires_views,
            shape_dim=1, exp_dim=1, tex_dim=1,
            compute_dtype=self.compute_dtype,
        )


class StudentState(NamedTuple):
    params: Params
    cond: Any           # folded zero-cond (field arch) or None (mlp arch)
    opt_state: Any
    step: jnp.ndarray


def init_student(key: jax.Array, cfg, lr: float = 1e-3):
    params, cond = init_point_field(key, cfg)
    # warm-start the sigma head positive: a random-init student whose raw
    # sigma goes negative everywhere loses ALL density gradient to relu's
    # dead zone and collapses to the empty field (measured on concentrated
    # teachers — scratch/diag_distexp.out; the same bistability as flagship
    # training, artifacts/lm_anneal.json). Starting alive lets the empty
    # majority prune density instead of the dead zone blocking growth.
    if isinstance(cfg, StudentConfig):
        params["sigma"]["b"] = params["sigma"]["b"] + 0.5
    else:  # field arch keeps the trunk layout: alpha head inside sigma
        params["sigma"]["alpha"]["b"] = params["sigma"]["alpha"]["b"] + 0.5
    tx = optax.adam(lr)
    return StudentState(params, cond, tx.init(params), jnp.asarray(0, jnp.int32)), tx


def _sample_points(key, dcfg: DistillConfig, batch: int):
    """(pts [B,3], dirs [B,3]): `ray_frac` of the batch along random orbit
    rays clipped to the AABB span, the rest uniform in the AABB with random
    directions."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    lo = jnp.asarray(dcfg.aabb_min)
    hi = jnp.asarray(dcfg.aabb_max)

    n_ray = int(batch * dcfg.ray_frac)
    n_uni = batch - n_ray

    # uniform coverage
    pts_u = lo + jax.random.uniform(k1, (n_uni, 3)) * (hi - lo)
    dirs_u = jax.random.normal(k2, (n_uni, 3))
    dirs_u = dirs_u / jnp.linalg.norm(dirs_u, axis=-1, keepdims=True)

    # view-distribution points: origins on the camera orbit sphere, rays
    # toward a jittered point in the volume, depths uniform in [near, far]
    o_dir = jax.random.normal(k3, (n_ray, 3))
    o_dir = o_dir / jnp.linalg.norm(o_dir, axis=-1, keepdims=True)
    origins = o_dir * dcfg.cam_radius
    targets = lo + jax.random.uniform(k4, (n_ray, 3)) * (hi - lo)
    d = targets - origins
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = dcfg.near + jax.random.uniform(k5, (n_ray,)) * (dcfg.far - dcfg.near)
    pts_r = origins + d * t[:, None]
    pts_r = jnp.clip(pts_r, lo, hi)

    return (
        jnp.concatenate([pts_r, pts_u], axis=0),
        jnp.concatenate([d, dirs_u], axis=0),
    )


def _field_raw(params, cfg, cond, pts, dirs):
    """Raw (rgb [N,3], sigma [N]) of one field at points/dirs."""
    pe = fourier_embed(pts, cfg.multires)
    de = fourier_embed(dirs, cfg.multires_views)
    dirf = de @ params["view"]["w_dirs"]
    raw_rgb, raw_sigma = point_apply(params, cond, pe, dirf, cfg)
    return raw_rgb.astype(jnp.float32), raw_sigma[:, 0].astype(jnp.float32)


def _field_outputs(params, cfg, cond, pts, dirs, sigma_activation="relu"):
    """Activated (rgb [N,3], sigma [N]) of one field at points/dirs."""
    from mofanerf_tpu.ops.composite import sigma_act

    raw_rgb, raw_sigma = _field_raw(params, cfg, cond, pts, dirs)
    return jax.nn.sigmoid(raw_rgb), sigma_act(sigma_activation)(raw_sigma)


def distill_loss(
    student_params: Params,
    student_cfg: FieldConfig,
    student_cond: Params,
    teacher_params: Params,
    teacher_cfg: FieldConfig,
    teacher_cond: Params,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    teacher_sigma_activation: str = "relu",
):
    # the student always uses relu at serve time; the TEACHER's density must
    # be read with the activation it was trained with
    rgb_t, sig_t = _field_outputs(teacher_params, teacher_cfg, teacher_cond,
                                  pts, dirs, teacher_sigma_activation)
    rgb_t = jax.lax.stop_gradient(rgb_t)
    sig_t = jax.lax.stop_gradient(sig_t)
    raw_rgb_s, raw_sig_s = _field_raw(
        student_params, student_cfg, student_cond, pts, dirs
    )
    rgb_s = jax.nn.sigmoid(raw_rgb_s)
    sig_s = jax.nn.relu(raw_sig_s)

    # rgb matters where the teacher has mass: weight by local opacity at a
    # nominal step (~the serving sample spacing)
    w = 1.0 - jnp.exp(-sig_t * 0.25)
    loss_rgb = jnp.mean(w[:, None] * (rgb_s - rgb_t) ** 2)
    loss_sig = jnp.mean((jnp.log1p(sig_s) - jnp.log1p(sig_t)) ** 2)
    # relu dead-zone rescue: where the teacher HAS density but the student's
    # raw sigma sits negative, the log1p term has zero gradient (relu) and
    # the student can collapse to the empty field for concentrated teachers
    # (scratch/diag_distexp.out). A linear pull on the raw value restores
    # gradient exactly there and vanishes once the point is alive.
    dead = (sig_t > 0.01) & (raw_sig_s < 0.0)
    loss_dead = jnp.mean(
        jnp.where(dead, -raw_sig_s * jnp.log1p(sig_t), 0.0)
    )
    return loss_rgb + loss_sig + loss_dead, {
        "loss_rgb": loss_rgb, "loss_sigma": loss_sig, "loss_dead": loss_dead,
    }


def distill_step(
    state: StudentState,
    tx: optax.GradientTransformation,
    teacher_params: Params,
    teacher_cfg: FieldConfig,
    teacher_cond: Params,
    dcfg: DistillConfig,
    student_cfg: FieldConfig,
    key: jax.Array,
):
    pts, dirs = _sample_points(key, dcfg, dcfg.batch)

    def loss_fn(p):
        return distill_loss(
            p, student_cfg, refold_cond(p, student_cfg),
            teacher_params, teacher_cfg, teacher_cond, pts, dirs,
            dcfg.teacher_sigma_activation,
        )

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics["loss"] = loss
    return StudentState(
        new_params, refold_cond(new_params, student_cfg), new_opt, state.step + 1
    ), metrics


def distill(
    teacher_params: Params,
    teacher_cfg: FieldConfig,
    teacher_cond: Params,
    dcfg: DistillConfig = DistillConfig(),
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[StudentState, FieldConfig]:
    """Run the full distillation loop on-device (lax.fori_loop inside one
    jit per log window). Returns (student_state, student_cfg)."""
    assert dcfg.cond_dim == 0, (
        "plain distill() would leave the conditioning weights untrained "
        "(no code is sampled) — use distill_expressions for cond_dim > 0"
    )
    student_cfg = dcfg.student_config(teacher_cfg)
    state, tx = init_student(jax.random.PRNGKey(seed), student_cfg, dcfg.lr)

    @jax.jit
    def run(state, k0, n):
        def body(i, carry):
            st, _ = carry
            st, m = distill_step(
                st, tx, teacher_params, teacher_cfg, teacher_cond,
                dcfg, student_cfg, jax.random.fold_in(k0, i),
            )
            return st, m["loss"]
        return jax.lax.fori_loop(0, n, body, (state, jnp.asarray(0.0)))

    key = jax.random.PRNGKey(seed + 1)
    window = log_every if log_every > 0 else dcfg.n_steps
    done = 0
    while done < dcfg.n_steps:
        n = min(window, dcfg.n_steps - done)
        state, loss = run(state, jax.random.fold_in(key, done), n)
        done += n
        if log_every:
            print(f"[DISTILL] step {done}/{dcfg.n_steps} loss {float(loss):.5f}")
    return state, student_cfg


# ---------------------------------------------------------------------------
# Deployable student artifacts: one .npz per avatar
# ---------------------------------------------------------------------------

def distill_provenance(dcfg: DistillConfig, **extra) -> Dict[str, Any]:
    """Provenance block for a student artifact: the distillation AABB and
    ray bounds the student was trained inside (a student is UNTRAINED
    outside its distill box — serving it with a different box silently
    renders garbage density), plus caller-supplied identity fields
    (person/expression/avatar ids)."""
    prov: Dict[str, Any] = {
        "aabb_min": [float(v) for v in dcfg.aabb_min],
        "aabb_max": [float(v) for v in dcfg.aabb_max],
        "near": float(dcfg.near),
        "far": float(dcfg.far),
        "teacher_sigma_activation": dcfg.teacher_sigma_activation,
        "n_steps": int(dcfg.n_steps),
    }
    for k, v in extra.items():
        if v is not None:
            prov[k] = v
    return prov


def save_student(path: str, params: Params, cfg,
                 provenance: Dict[str, Any] | None = None) -> None:
    """Write a distilled student as ONE deployable file: flat params keyed
    by pytree path + the StudentConfig as JSON metadata. The serving-side
    analog of the reference's baked artifacts (refineNet corpus renders,
    render_refine_trainSet.py): distill once, serve from the file.

    `provenance` (see distill_provenance) records the distillation AABB /
    near-far and the identity the student encodes; loaders should prefer
    these over environment-derived bounds."""
    import json

    import numpy as np

    assert isinstance(cfg, StudentConfig), "artifacts are for StudentConfig"
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    arrs = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in leaves}
    meta = dataclasses.asdict(cfg)
    meta["compute_dtype"] = jnp.dtype(cfg.compute_dtype).name
    if provenance:
        meta["provenance"] = provenance
    np.savez(path, __meta__=json.dumps(meta), **arrs)


def load_student(path: str, with_provenance: bool = False):
    """Load a save_student artifact -> (params, StudentConfig) or, with
    `with_provenance`, (params, StudentConfig, provenance-dict) where the
    dict is empty for artifacts saved without one."""
    import json

    import numpy as np

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    prov = meta.pop("provenance", {})
    meta["compute_dtype"] = jnp.dtype(meta["compute_dtype"]).type
    cfg = StudentConfig(**meta)
    template = init_point_field(jax.random.PRNGKey(0), cfg)[0]
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl in paths:
        arr = z[jax.tree_util.keystr(kp)]
        assert arr.shape == tmpl.shape, (jax.tree_util.keystr(kp), arr.shape)
        leaves.append(jnp.asarray(arr))
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
    if with_provenance:
        return params, cfg, prov
    return params, cfg


# ---------------------------------------------------------------------------
# Expression-conditioned distillation: ONE student per (identity, texture)
# covering the whole expression bank + interpolations
# ---------------------------------------------------------------------------

def student_code(model_params: Params, shape_code: jnp.ndarray,
                 raw_exp_code: jnp.ndarray) -> jnp.ndarray:
    """The conditioning code a conditioned student expects: the
    ISM-modulated expression latent (the quantity that actually
    parameterizes the teacher's geometry — models/ism.py). `raw_exp_code`
    is a bank latent (`exp_code_for`) or any convex mixture of them."""
    from mofanerf_tpu.models.ism import modulate_expression

    return modulate_expression(model_params["ism"], shape_code, raw_exp_code)


def _sample_exp_code(key, exp_bank: jnp.ndarray):
    """Random point on (and at the corners of) the expression simplex edges:
    a convex mix of two bank codes with the mix weight drawn U(-0.25, 1.25)
    clipped to [0, 1] — point mass at the endpoints (the 20 trained
    expressions) plus uniform coverage of pairwise interpolations (the
    reference's rigging path sweeps exactly these, run_fit.py:379-431)."""
    ki, kj, ka = jax.random.split(key, 3)
    n = exp_bank.shape[0]
    i = jax.random.randint(ki, (), 0, n)
    j = jax.random.randint(kj, (), 0, n)
    a = jnp.clip(jax.random.uniform(ka, (), minval=-0.25, maxval=1.25), 0.0, 1.0)
    return (1.0 - a) * exp_bank[i] + a * exp_bank[j]


def distill_conditioned(
    teacher_params: Params,      # the fine field subtree
    teacher_cfg: FieldConfig,
    sample_code,                 # jittable: key -> (code [cond_dim], teacher_cond)
    dcfg: DistillConfig,         # cond_dim > 0
    seed: int = 0,
    log_every: int = 0,
    tag: str = "DISTILL-COND",
) -> Tuple[StudentState, Any]:
    """Generic conditioned distillation: per step, `sample_code` draws a
    point of the teacher FAMILY — a student conditioning code plus the
    teacher's folded conditioning for it (tiny matmuls, in-graph) — and the
    student (whose code folds to biases, models/student.py::
    fold_student_code) matches the teacher at shared sample points.
    distill_expressions / distill_avatars are instances."""
    assert dcfg.cond_dim > 0, "conditioned distillation needs cond_dim > 0"
    student_cfg = dcfg.student_config(teacher_cfg)
    state, tx = init_student(jax.random.PRNGKey(seed), student_cfg, dcfg.lr)

    def step(st, key):
        kc, kp = jax.random.split(key)
        code, teacher_cond = sample_code(kc)
        pts, dirs = _sample_points(kp, dcfg, dcfg.batch)

        def loss_fn(p):
            return distill_loss(
                p, student_cfg, code,
                teacher_params, teacher_cfg, teacher_cond, pts, dirs,
                dcfg.teacher_sigma_activation,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return StudentState(new_params, None, new_opt, st.step + 1), loss

    @jax.jit
    def run(state, k0, n):
        def body(i, carry):
            st, _ = carry
            return step(st, jax.random.fold_in(k0, i))
        return jax.lax.fori_loop(0, n, body, (state, jnp.asarray(0.0)))

    key = jax.random.PRNGKey(seed + 1)
    window = log_every if log_every > 0 else dcfg.n_steps
    done = 0
    while done < dcfg.n_steps:
        n = min(window, dcfg.n_steps - done)
        state, loss = run(state, jax.random.fold_in(key, done), n)
        done += n
        if log_every:
            print(f"[{tag}] step {done}/{dcfg.n_steps} loss {float(loss):.5f}")
    return state, student_cfg


def distill_expressions(
    model_params: Params,        # FULL model pytree: fine + ism + exp_codes
    spec,                        # render.renderer.MoFaNeRF
    shape_code: jnp.ndarray,
    tex_code: jnp.ndarray,
    dcfg: DistillConfig | None = None,
    exp_ids=None,                # bank slots to cover (default: the 20 trained)
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[StudentState, Any]:
    """Distill ONE code-conditioned student covering every expression in
    `exp_ids` plus their pairwise interpolations — the serving-path analog
    of the reference's expression rigging (run_fit.py:379-431,
    `rendering_modulation`), amortizing per-avatar distillation across the
    whole bank. Render with::

        code = student_code(model_params, shape_code, raw_exp)
        render_frame_serve(st.params, scfg, code, ...)   # cond = the code

    The fold keeps serving throughput identical to an unconditioned
    student's (same matmuls, same fused kernel).
    """
    from mofanerf_tpu.models.field import fold_conditioning
    from mofanerf_tpu.models.ism import modulate_expression

    if dcfg is None:
        dcfg = DistillConfig(cond_dim=int(spec.exp_dim))
    assert dcfg.cond_dim == spec.exp_dim, (
        f"cond_dim {dcfg.cond_dim} != exp_dim {spec.exp_dim}"
    )
    if exp_ids is None:
        from mofanerf_tpu.render.renderer import N_EXPRESSIONS

        exp_ids = list(range(N_EXPRESSIONS))
    exp_bank = jnp.asarray(model_params["exp_codes"])[jnp.asarray(exp_ids)]
    teacher_params = model_params["fine"]
    ism_params = model_params["ism"]

    def sample_code(key):
        raw = _sample_exp_code(key, exp_bank)
        exp_mod = modulate_expression(ism_params, shape_code, raw)
        return exp_mod, fold_conditioning(
            teacher_params, shape_code, exp_mod, tex_code)

    return distill_conditioned(teacher_params, spec.fine, sample_code, dcfg,
                               seed, log_every, tag="DISTILL-EXP")


def avatar_code(model_params: Params, shape_code: jnp.ndarray,
                raw_exp_code: jnp.ndarray) -> jnp.ndarray:
    """The conditioning code a multi-avatar student expects:
    [shape_code ; ISM-modulated expression latent]."""
    return jnp.concatenate(
        [shape_code, student_code(model_params, shape_code, raw_exp_code)])


def distill_avatars(
    model_params: Params,        # FULL model pytree: fine + ism + exp_codes
    spec,                        # render.renderer.MoFaNeRF
    avatars,                     # list of (shape_code [S], tex_code [T])
    dcfg: DistillConfig | None = None,
    exp_ids=None,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[StudentState, Any]:
    """ONE student serving SEVERAL avatars x the whole expression bank:
    the conditioning code is [shape ; modulated expression] (the shape code
    uniquely indexes the avatar, so geometry AND appearance follow it).
    Render with `avatar_code(model_params, shape_i, raw_exp)` as cond —
    same fold, same fused kernel, same serving throughput."""
    from mofanerf_tpu.models.field import fold_conditioning
    from mofanerf_tpu.models.ism import modulate_expression

    cond_dim = int(spec.shape_dim) + int(spec.exp_dim)
    if dcfg is None:
        dcfg = DistillConfig(cond_dim=cond_dim)
    assert dcfg.cond_dim == cond_dim, (
        f"cond_dim {dcfg.cond_dim} != shape_dim+exp_dim {cond_dim}"
    )
    if exp_ids is None:
        from mofanerf_tpu.render.renderer import N_EXPRESSIONS

        exp_ids = list(range(N_EXPRESSIONS))
    exp_bank = jnp.asarray(model_params["exp_codes"])[jnp.asarray(exp_ids)]
    shapes = jnp.stack([jnp.asarray(a[0]) for a in avatars])   # [A, S]
    texs = jnp.stack([jnp.asarray(a[1]) for a in avatars])     # [A, T]
    teacher_params = model_params["fine"]
    ism_params = model_params["ism"]

    def sample_code(key):
        ka, ke = jax.random.split(key)
        i = jax.random.randint(ka, (), 0, shapes.shape[0])
        shape, tex = shapes[i], texs[i]
        raw = _sample_exp_code(ke, exp_bank)
        exp_mod = modulate_expression(ism_params, shape, raw)
        code = jnp.concatenate([shape, exp_mod])
        return code, fold_conditioning(teacher_params, shape, exp_mod, tex)

    return distill_conditioned(teacher_params, spec.fine, sample_code, dcfg,
                               seed, log_every, tag="DISTILL-AVATARS")
