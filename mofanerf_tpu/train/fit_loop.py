"""Host-side fitting driver: pyramid schedule + checkpoints + previews.

Orchestrates `fit_step` (train/fit.py) the way the reference's
`run_fit.train` does (run_fit.py:134-350), plus the two render-only modes:
- "rendering": novel views at yaw -60/0/60 (run_fit.py:352-377),
- "rendering_modulation": expression rigging over exp ids [9,14,2,16,17]
  and shape/texture swaps from predefined presets (run_fit.py:379-431).

The jitted fit step has a static [N_rand] signature for every pyramid level
(see train/fit.py), so the whole 2000-iteration schedule runs on one
compiled program.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.data.landmarks import FitRaySampler
from mofanerf_tpu.render.renderer import MoFaNeRF
from mofanerf_tpu.train.fit import (
    FitCodes,
    FitConfig,
    FitState,
    fit_step,
    init_fit_state,
    make_fit_optimizer,
    render_fit_frame,
)
from mofanerf_tpu.utils.metrics import to8b

# Expression ids used by the reference's modulation demo (run_fit.py:387)
MODULATION_EXPRESSIONS = [9, 14, 2, 16, 17]


def save_fit_state(path: str, state: FitState) -> None:
    """Codes + step in an npz, full optimizer state (Adam moments +
    schedule counts) pickled alongside — the reference saves its three
    optimizer state dicts too (run_fit.py:320-331); without them a resume
    restarts the staged LR schedule at the base rate and perturbs the
    converged codes."""
    import pickle

    np.savez(
        path,
        shape=np.asarray(state.codes.shape),
        tex=np.asarray(state.codes.tex),
        exp=np.asarray(state.codes.exp),
        pose=np.asarray(state.codes.pose),
        light=np.asarray(state.codes.light),
        step=int(state.step),
    )
    opt_np = jax.tree_util.tree_map(np.asarray, state.opt_state)
    with open(str(path) + ".opt", "wb") as f:
        pickle.dump(opt_np, f)


def load_fit_codes(path: str) -> tuple:
    d = np.load(path)
    codes = FitCodes(
        shape=jnp.asarray(d["shape"]),
        tex=jnp.asarray(d["tex"]),
        exp=jnp.asarray(d["exp"]),
        pose=jnp.asarray(d["pose"]),
        light=jnp.asarray(d["light"]),
    )
    return codes, int(d["step"])


def load_fit_opt_state(path: str):
    """Restore the pickled optimizer state saved next to the codes npz
    (None if absent — old checkpoints)."""
    import pickle

    opt_path = str(path) + ".opt"
    if not os.path.exists(opt_path):
        return None
    with open(opt_path, "rb") as f:
        opt_np = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, opt_np)


def fit(
    model_params: Dict[str, Any],
    spec: MoFaNeRF,
    target_img: np.ndarray,        # [512, 512, 3] float [0,1] preprocessed photo
    pose_init: np.ndarray,         # [4, 4] c2w from pose estimation
    kp2d: np.ndarray,              # [68, 2] detected landmarks (row, col)
    out_dir: str,
    cfg: FitConfig = FitConfig(),
    seed: int = 0,
    resume: bool = False,
    exp_init: Optional[jnp.ndarray] = None,
    shape_stats=None,
    tex_stats=None,
) -> FitState:
    import cv2
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    imageio.imwrite(os.path.join(out_dir, "target.png"), to8b(target_img))
    ckpt_path = os.path.join(out_dir, "fit_params.npz")

    state = init_fit_state(
        jax.random.PRNGKey(seed), cfg, pose_init,
        shape_stats=shape_stats, tex_stats=tex_stats, exp_init=exp_init,
    )
    tx = make_fit_optimizer(cfg)
    begin = 0
    if resume and os.path.exists(ckpt_path):
        codes, begin = load_fit_codes(ckpt_path)
        opt_state = load_fit_opt_state(ckpt_path)
        if opt_state is None:
            print("WARNING: resuming without optimizer state (old checkpoint); "
                  "Adam moments and the LR schedule restart")
            opt_state = state.opt_state
        state = FitState(codes, opt_state, jnp.asarray(begin, jnp.int32))

    sampler = FitRaySampler(kp2d, cfg.H)
    step_jit = jax.jit(
        lambda s, c, t, k: fit_step(model_params, spec, tx, s, c, t, k,
                                    pose_freeze_iters=cfg.pose_freeze_iters)
    )

    K_full = np.array(
        [[cfg.focal, 0, 0.5 * cfg.W], [0, cfg.focal, 0.5 * cfg.H], [0, 0, 1]],
        np.float32,
    )
    rng = np.random.default_rng(seed)

    # pyramid state (run_fit.py:186-193, 267-280)
    scale_now = 8
    size = cfg.H // scale_now
    target_scaled = cv2.resize(target_img, (size, size)).astype(np.float32)
    n_levels = int(np.log2(8))

    for e in range(begin, begin + cfg.n_iters + 1):
        if e in cfg.change_epoch[:n_levels] or (e % 2000 == 0 and e > 0):
            scale_now = max(scale_now // 2, 1)
            size = cfg.H // scale_now
            target_scaled = cv2.resize(target_img, (size, size)).astype(np.float32)

        coords = sampler.sample(rng, cfg.n_rand, scale=scale_now, target_img=target_scaled)
        targets = jnp.asarray(target_scaled[coords[:, 0], coords[:, 1]])
        K = jnp.asarray(K_full / scale_now, jnp.float32)
        state, loss = step_jit(state, jnp.asarray(coords, jnp.float32), targets, K)

        if e % 10 == 0:
            print(f"[FIT] iter {e} loss {float(loss):.5f} scale 1/{scale_now}")
        if e % cfg.ckpt_every == 0:
            save_fit_state(ckpt_path, state)
        if e > 0 and (e % cfg.preview_every == 0 or e in (100, 200, 300)):
            Hp = Wp = cfg.H // 2
            out = render_fit_frame(
                model_params, spec, state.codes, Hp, Wp, jnp.asarray(K_full / 2)
            )
            imageio.imwrite(
                os.path.join(out_dir, f"fit_{e:05d}.png"), to8b(np.asarray(out["rgb"]))
            )

    save_fit_state(ckpt_path, state)
    # always leave a final preview (short runs may never cross
    # preview_every; downstream drivers read the last render)
    out = render_fit_frame(
        model_params, spec, state.codes, cfg.H // 2, cfg.W // 2,
        jnp.asarray(K_full / 2)
    )
    imageio.imwrite(os.path.join(out_dir, "fit_final.png"),
                    to8b(np.asarray(out["rgb"])))
    return state


def render_novel_views(
    model_params, spec, codes: FitCodes, out_dir: str, cfg: FitConfig = FitConfig(),
    yaws=(-60.0, 0.0, 60.0),
) -> None:
    """'rendering' mode: fitted face from orbit yaw angles (run_fit.py:352-377)."""
    import imageio.v2 as imageio
    from mofanerf_tpu.ops.rays import pose_spherical

    os.makedirs(out_dir, exist_ok=True)
    H = W = cfg.H // 2
    K = jnp.asarray(
        np.array([[cfg.focal / 2, 0, 0.5 * W], [0, cfg.focal / 2, 0.5 * H], [0, 0, 1]]),
        jnp.float32,
    )
    for yaw in yaws:
        c2w = pose_spherical(yaw, 0.0, 16.0)
        view_codes = codes._replace(pose=jnp.asarray(c2w))
        out = render_fit_frame(model_params, spec, view_codes, H, W, K)
        imageio.imwrite(
            os.path.join(out_dir, f"novel_yaw{int(yaw):+04d}.png"),
            to8b(np.asarray(out["rgb"])),
        )


def render_modulation(
    model_params, spec, codes: FitCodes, out_dir: str,
    exp_bank: jnp.ndarray,                  # [>=20, 30] trained expression latents
    presets: Optional[Dict[str, Any]] = None,  # {"shape": [k,50], "texture": [k,1,256]}
    cfg: FitConfig = FitConfig(),
) -> None:
    """'rendering_modulation' mode: re-rig the fitted identity with trained
    expression latents and preset shape/texture swaps (run_fit.py:379-431)."""
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    H = W = cfg.H // 2
    K = jnp.asarray(
        np.array([[cfg.focal / 2, 0, 0.5 * W], [0, cfg.focal / 2, 0.5 * H], [0, 0, 1]]),
        jnp.float32,
    )
    for exp_id in MODULATION_EXPRESSIONS:
        mod_codes = codes._replace(exp=exp_bank[exp_id])
        out = render_fit_frame(model_params, spec, mod_codes, H, W, K)
        imageio.imwrite(
            os.path.join(out_dir, f"exp_{exp_id:02d}.png"), to8b(np.asarray(out["rgb"]))
        )
    if presets:
        for k, shape in enumerate(presets.get("shape", [])):
            out = render_fit_frame(
                model_params, spec, codes._replace(shape=jnp.asarray(shape).reshape(-1)),
                H, W, K,
            )
            imageio.imwrite(
                os.path.join(out_dir, f"shape_preset_{k}.png"), to8b(np.asarray(out["rgb"]))
            )
        for k, tex in enumerate(presets.get("texture", [])):
            out = render_fit_frame(
                model_params, spec, codes._replace(tex=jnp.asarray(tex).reshape(-1)),
                H, W, K,
            )
            imageio.imwrite(
                os.path.join(out_dir, f"texture_preset_{k}.png"), to8b(np.asarray(out["rgb"]))
            )
