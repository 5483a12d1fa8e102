"""Inverse rendering: fit latent codes + camera pose + light to one photo.

Capability parity with the reference fitting driver (run_fit.py:134-350):
optimize {shape 50, texture 256, expression 30, camera pose, global light
scale 2} against a single preprocessed 512x512 photo with
- three Adam groups at the reference's learning rates
  (light+pose @2e-3, texture @2e-3, expression+shape @4e-3 — run_fit.py:217-219),
- the staged lr decay `lr * (1/1.1)^(step // (iters/6))`, overridden to
  5e-4 past step 1500 (run_fit.py:25-32),
- a coarse-to-fine image pyramid 512/8 -> 512 via change_epoch
  [0, 600, 1000, 1300, 1500] (run_fit.py:267-280),
- landmark-biased ray sampling from detected kp2d (run_fit.py:35-82),
- L1 loss with a learned global light scale (run_fit.py:309),
- parameter checkpoints every 100 iters + preview renders (run_fit.py:320-350).

TPU-first design: ONE jitted step for the entire schedule. Rays are
generated only at the selected pixel coordinates (ops.rays.get_rays_at), so
the step signature is [N_rand]-static across every pyramid level — the
reference's per-level full-frame ray grids would force a recompile per
level. The three optimizer groups are one `optax.multi_transform` over a
single code pytree. The texture encoder is bypassed: `tex` is optimized
directly as a code, matching `render_fitting`'s uvCodes path
(models/render_class.py:424). Expression uses the dedicated fitting slot
(index 20 — models/render_class.py:420-423) — here simply a free 30-dim
code, no bank mutation needed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mofanerf_tpu.ops.rays import get_rays_at
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    prepare_conditioning,
    render_rays,
    render_frame,
)

Params = Dict[str, Any]


class FitCodes(NamedTuple):
    shape: jnp.ndarray   # [50]
    tex: jnp.ndarray     # [256]
    exp: jnp.ndarray     # [30]
    pose: jnp.ndarray    # [4, 4] c2w (differentiable)
    light: jnp.ndarray   # [2] — only light[0] used (run_fit.py:309)


class FitState(NamedTuple):
    codes: FitCodes
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FitConfig:
    n_iters: int = 2000
    n_rand: int = 1024
    lr: float = 2e-3          # light+pose and texture groups
    lr_shape: float = 4e-3    # expression+shape group
    decreased_by: float = 1.1
    H: int = 512
    W: int = 512
    focal: float = 1200.0
    change_epoch: tuple = (0, 600, 1000, 1300, 1500)
    ckpt_every: int = 100
    preview_every: int = 500
    # pose stays frozen for the first `pose_freeze_iters` steps so the codes
    # first explain the image at the init pose; afterwards the pose gradient
    # tracks residual geometric misalignment instead of appearance error
    # (measured round 3: co-optimizing from step 0 let codes absorb the
    # init pose error and DRIFT the rotation 5.9->19.9 deg,
    # artifacts/fit_quality.json)
    pose_freeze_iters: int = 0


def fit_lr_schedule(base_lr: float, n_iters: int, decreased_by: float = 1.1):
    """run_fit.py:25-32 exactly: staged decay, 5e-4 floor past 1500."""
    adjust_every = max(1, int(n_iters / 6))

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = base_lr * (1.0 / decreased_by) ** jnp.floor(step / adjust_every)
        return jnp.where(step > 1500, 5e-4, lr)

    return sched


def make_fit_optimizer(cfg: FitConfig) -> optax.GradientTransformation:
    labels = FitCodes(
        shape="shape_exp", tex="tex", exp="shape_exp",
        pose="pose_light", light="pose_light",
    )
    return optax.multi_transform(
        {
            "pose_light": optax.adam(fit_lr_schedule(cfg.lr, cfg.n_iters, cfg.decreased_by)),
            "tex": optax.adam(fit_lr_schedule(cfg.lr, cfg.n_iters, cfg.decreased_by)),
            "shape_exp": optax.adam(
                fit_lr_schedule(cfg.lr_shape, cfg.n_iters, cfg.decreased_by)
            ),
        },
        labels,
    )


def init_fit_state(
    key: jax.Array,
    cfg: FitConfig,
    pose_init: np.ndarray,
    shape_stats: Optional[tuple] = None,   # (mu [50], std [50])
    tex_stats: Optional[tuple] = None,     # (mu [256], std [256])
    exp_init: Optional[jnp.ndarray] = None,
) -> FitState:
    """Random code init from the texShpDistribution stats (the reference's
    randSp/randTex, tools/wild_fit_base.py:21-45); expression starts from
    the neutral latent (run_fit.py:205)."""
    k1, k2 = jax.random.split(key)
    if shape_stats is not None:
        mu, std = shape_stats
        shape = jnp.asarray(mu) + jnp.asarray(std) * jax.random.normal(k1, (50,))
    else:
        shape = jax.random.normal(k1, (50,)) * 0.1
    if tex_stats is not None:
        mu, std = tex_stats
        tex = jnp.asarray(mu) + jnp.asarray(std) * jax.random.normal(k2, (256,))
    else:
        tex = jax.random.normal(k2, (256,)) * 0.1
    exp = exp_init if exp_init is not None else jnp.zeros(30)
    codes = FitCodes(
        shape=shape.reshape(50),
        tex=tex.reshape(256),
        exp=jnp.asarray(exp).reshape(30),
        pose=jnp.asarray(pose_init, jnp.float32).reshape(4, 4),
        light=jnp.ones(2),
    )
    tx = make_fit_optimizer(cfg)
    return FitState(codes, tx.init(codes), jnp.asarray(0, jnp.int32))


def load_code_stats(path: str):
    """texShpDistribution.npy -> ((shape_mu, shape_std), (tex_mu, tex_std))."""
    d = np.load(path, allow_pickle=True).item()
    return (
        (d["shape_mean"].reshape(-1), d["shape_std"].reshape(-1)),
        (d["texture_mean"].reshape(-1), d["texture_std"].reshape(-1)),
    )


def project_pose_so3(pose: jnp.ndarray) -> jnp.ndarray:
    """Retract a 4x4 c2w onto the rigid-motion manifold: rotation block to
    the nearest element of SO(3) (polar projection via SVD), bottom row
    pinned to [0,0,0,1]. The reference optimizes the raw 4x4 with Adam
    (run_fit.py:116-127,217-219); unconstrained, the per-element adaptive
    steps shear/scale the rotation block and the latent codes absorb the
    resulting non-rigid error — measured as rotation error GROWING during
    fitting (5.9 -> 19.9 deg, artifacts/fit_quality.json round 3)."""
    R = pose[:3, :3]
    u, _, vt = jnp.linalg.svd(R, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    Rp = u @ (jnp.stack([jnp.ones(()), jnp.ones(()), det])[:, None] * vt)
    pose = pose.at[:3, :3].set(Rp)
    return pose.at[3].set(jnp.asarray([0.0, 0.0, 0.0, 1.0], pose.dtype))


def fit_step(
    model_params: Params,
    spec: MoFaNeRF,
    tx: optax.GradientTransformation,
    state: FitState,
    coords: jnp.ndarray,       # [N, 2] float (row, col) at current pyramid scale
    target_rgb: jnp.ndarray,   # [N, 3]
    K: jnp.ndarray,            # [3, 3] intrinsics at current pyramid scale
    pose_freeze_iters: int = 0,
):
    """One fitting step; model params are frozen, only codes optimize. The
    pose leaf lives on SE(3): its gradient is masked for the first
    `pose_freeze_iters` steps, and every update is retracted back onto the
    manifold (project_pose_so3)."""

    def loss_fn(codes: FitCodes):
        rays_o, rays_d = get_rays_at(coords, K, codes.pose)
        cond = prepare_conditioning(model_params, spec, codes.shape, codes.exp, codes.tex)
        out = render_rays(model_params, spec, cond, rays_o, rays_d, key=None, train=False)
        return jnp.mean(jnp.abs(codes.light[0] * out["rgb"] - target_rgb))

    loss, grads = jax.value_and_grad(loss_fn)(state.codes)
    if pose_freeze_iters > 0:
        live = (state.step >= pose_freeze_iters).astype(grads.pose.dtype)
        grads = grads._replace(pose=grads.pose * live)
    updates, new_opt = tx.update(grads, state.opt_state, state.codes)
    new_codes = optax.apply_updates(state.codes, updates)
    new_codes = new_codes._replace(pose=project_pose_so3(new_codes.pose))
    return FitState(new_codes, new_opt, state.step + 1), loss


def render_fit_frame(
    model_params: Params,
    spec: MoFaNeRF,
    codes: FitCodes,
    H: int,
    W: int,
    K: jnp.ndarray,
    apply_light: bool = True,
):
    """Full-frame render with the fitted codes (preview / novel view /
    modulation rendering — run_fit.py:332-431)."""
    cond = prepare_conditioning(model_params, spec, codes.shape, codes.exp, codes.tex)
    out = render_frame(model_params, spec, cond, H, W, K, codes.pose[:3])
    if apply_light:
        out = dict(out)
        out["rgb"] = codes.light[0] * out["rgb"]
    return out
