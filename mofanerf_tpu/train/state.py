"""Train state + the single jitted training step.

Capability parity with the reference's core optimization loop
(run_train.py:278-365): per-step random-image ray batch -> two-pass render
-> MSE(fine) + MSE(coarse) -> Adam over ALL trainable state (both fields,
texture encoder, ISM, expression latents — tools/create_model_condition.py:51-53)
with exponential lr decay `lrate * 0.1^(step / (lrate_decay*1500))`
(run_train.py:360-365).

TPU-first: the whole step — texture encoding, conditioning fold, coarse
and fine render, losses, Adam update — is ONE jit-compiled function.
Ray batches shard over the mesh's `data` axis; gradients reduce over ICI
automatically via XLA's partitioner (replaces DataParallel scatter/gather,
run_train.py:272-276).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    init_model_params,
    prepare_conditioning,
    render_rays,
    encode_texture,
    exp_code_for,
)
from mofanerf_tpu.utils.metrics import img2mse, mse2psnr

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def lr_at(step, lrate: float = 5e-5, lrate_decay: int = 250) -> jnp.ndarray:
    """Reference schedule: lrate * 0.1^(step / (lrate_decay*1500))
    (run_train.py:360-365; shipped lrate=5e-5, configs/exp_mofanerf.txt)."""
    decay_steps = lrate_decay * 1500
    return lrate * (0.1 ** (jnp.asarray(step, jnp.float32) / decay_steps))


def make_optimizer(lrate: float = 5e-5, lrate_decay: int = 250) -> optax.GradientTransformation:
    sched = lambda step: lr_at(step, lrate, lrate_decay)
    # torch Adam defaults (betas 0.9/0.999, eps 1e-8) — reference uses
    # torch.optim.Adam(grad_vars, lr=...) (tools/create_model_condition.py:53).
    return optax.adam(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(
    key: jax.Array,
    spec: MoFaNeRF,
    lrate: float = 5e-5,
    lrate_decay: int = 250,
) -> TrainState:
    params = init_model_params(key, spec)
    tx = make_optimizer(lrate, lrate_decay)
    return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))


class Batch(NamedTuple):
    """One training batch: N_rand rays from one (identity, expression) frame
    (run_train.py:335 — the reference's `no_batching` mode draws from a
    single random image per step)."""

    rays_o: jnp.ndarray      # [N, 3]
    rays_d: jnp.ndarray      # [N, 3]
    target_rgb: jnp.ndarray  # [N, 3]
    shape_code: jnp.ndarray  # [shape_dim]
    exp_type: jnp.ndarray    # scalar int
    uv_map: jnp.ndarray      # [512, 512, 3]


def train_step(
    state: TrainState,
    batch: Batch,
    key: jax.Array,
    spec: MoFaNeRF,
    tx: optax.GradientTransformation,
    skip_nonfinite: bool = True,
):
    """One optimization step. Returns (new_state, metrics).

    skip_nonfinite: when the loss or any gradient is non-finite, keep the
    old params/optimizer state and only advance the step counter — the
    functional replacement for the reference's catch-exception-and-rebuild
    recovery (run_train.py:348-356), without the rebuild."""

    def loss_fn(params):
        tex = encode_texture(params, spec, batch.uv_map)
        cond = prepare_conditioning(
            params, spec, batch.shape_code, exp_code_for(params, batch.exp_type), tex
        )
        out = render_rays(params, spec, cond, batch.rays_o, batch.rays_d, key, train=True)
        img_loss = img2mse(out["rgb"], batch.target_rgb)
        loss = img_loss
        if "rgb0" in out:
            loss = loss + img2mse(out["rgb0"], batch.target_rgb)
        return loss, img_loss

    (loss, img_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    if skip_nonfinite:
        grads_ok = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        ok = jnp.isfinite(loss) & grads_ok
        pick = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        new_params = pick(new_params, state.params)
        new_opt = pick(new_opt, state.opt_state)
        metrics = {"loss": loss, "psnr": mse2psnr(img_loss), "step_ok": ok}
    else:
        metrics = {"loss": loss, "psnr": mse2psnr(img_loss)}
    return TrainState(new_params, new_opt, state.step + 1), metrics
