"""Warm the remote TPU compile cache for the round-4 refine study shapes:
the full G+D train step at 256^2, batch 4, ngf=32, 9 blocks, n_down=4,
perceptual term ON (fixed random-init VGG19) + lambda_l1 — exactly the
configuration examples/refine_nerf_corpus.py will jit. Compiles survive
process restarts server-side, so this shaves ~10 min off the study."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mofanerf_tpu.train.refine import (
    RefineConfig, build_models, init_refine_state,
    make_refine_optimizers, refine_train_step,
)
from mofanerf_tpu.models.refine.losses import VGG19Features

RES, BATCH = 256, 4
rcfg = RefineConfig(use_vgg=True, lambda_l1=10.0, ngf=32, n_blocks=9,
                    n_downsampling=4)
state = init_refine_state(jax.random.PRNGKey(0), rcfg, steps_per_epoch=160,
                          image_size=RES)
g_tx, d_tx = make_refine_optimizers(rcfg, 160)
tvgg = VGG19Features()
train_vgg_params = tvgg.init(jax.random.PRNGKey(7),
                             jnp.zeros((1, RES, RES, 3)))
step = jax.jit(lambda s, a, b: refine_train_step(
    s, a, b, rcfg, g_tx, d_tx, vgg_params=train_vgg_params))

a = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, RES, RES, 3)) * 2 - 1
b = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, RES, RES, 3)) * 2 - 1
t0 = time.time()
state, m = step(state, a, b)
print(f"compile+step1: {time.time() - t0:.1f}s loss_G={float(m['loss_G']):.3f}")
t0 = time.time()
for _ in range(8):
    state, m = step(state, a, b)
float(m["loss_G"])
print(f"8 steps: {time.time() - t0:.1f}s -> {8 / (time.time() - t0):.2f} it/s")

# also warm the G-only inference shape used at eval time (batch 1)
g, _ = build_models(rcfg)
infer = jax.jit(lambda x: g.apply(state.g_params, x))
t0 = time.time()
infer(a[:1]).block_until_ready()
print(f"infer compile: {time.time() - t0:.1f}s")
print("PRECOMPILE_REFINE256 OK")
