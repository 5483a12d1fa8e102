"""Benchmark: render throughput (rays/sec/chip) on the flagship model.

Two measurements on one chip, fine net 10x1024 bf16:

1. PRODUCTION (headline): occupancy-grid culled rendering
   (ops/occupancy.py) — 64 stratified probes per ray resolved against a
   64^3 density grid (pure gathers), fine MLP evaluated on the top-32
   occupied samples only. This is the deployment path; the grid is built
   once per trained model for ~one packet's worth of compute.
2. REFERENCE BUDGET (extra): the reference's exact sample schedule —
   64-sample coarse pass (8x256) + 128-sample fine pass
   (configs/exp_mofanerf.txt:16-17, models/render_class.py:328).

Timing methodology: the iteration loop runs INSIDE one jit via
`lax.fori_loop` and a single scalar is read back. On this environment the
TPU is reached through a relay where `block_until_ready` returns before
execution finishes and every host readback costs ~200 ms — naive per-call
timing reports physically impossible numbers. Device-looped timing matches
the chip's achievable FLOP/s (~70% of bf16 peak on the reference path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.ops.occupancy import OccupancyGrid, render_rays_occupancy
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    RenderConfig,
    init_model_params,
    prepare_conditioning,
    render_rays,
    exp_code_for,
)

BASELINE_RAYS_PER_SEC = 5e6
N_RAYS = 8192
K_INNER = 16
S_PROBE, K_KEEP = 64, 32
OCC_FRACTION = 0.1  # face-like occupancy for the synthetic grid


def _timed(loop_fn, *args, k=K_INNER):
    float(loop_fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop_fn(*args))
    return (time.perf_counter() - t0) / k


def main() -> None:
    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
        fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
        render=RenderConfig(n_coarse=64, n_importance=64),
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(
        params, spec, jnp.zeros(spec.shape_dim), exp_code_for(params, 0),
        jnp.zeros(spec.tex_dim),
    )
    rays_d = jax.random.normal(jax.random.PRNGKey(1), (N_RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((N_RAYS, 3))

    # --- production: occupancy-culled fine-only rendering
    G = 64
    occ = jax.random.uniform(jax.random.PRNGKey(3), (G, G, G)) < OCC_FRACTION
    grid = OccupancyGrid(occ, jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))

    @jax.jit
    def loop_prod(o, d):
        def body(i, acc):
            out = render_rays_occupancy(
                params["fine"], spec.fine, cond.fine, grid, o + i * 1e-6, d,
                spec.render.near, spec.render.far, S_PROBE, K_KEEP,
            )
            return acc + jnp.sum(out["rgb"])
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)

    sec_prod = _timed(loop_prod, rays_o, rays_d)
    prod_rays = N_RAYS / sec_prod

    # --- reference budget: coarse 64 + fine 128
    @jax.jit
    def loop_ref(o, d):
        def body(i, acc):
            out = render_rays(params, spec, cond, o + i * 1e-6, d)["rgb"]
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)

    sec_ref = _timed(loop_ref, rays_o, rays_d)
    ref_rays = N_RAYS / sec_ref
    ref_flops = N_RAYS * 128 * (22 * 2 * 1024 * 1024) + N_RAYS * 64 * (22 * 2 * 256 * 256)

    # --- fitting: iterations/sec of the single-photo inverse-rendering step
    # (N_rand=1024 rays through the full two-pass model + 3-group Adam,
    # run_fit.py budget)
    from mofanerf_tpu.ops.rays import pose_spherical
    from mofanerf_tpu.train.fit import FitConfig, fit_step, init_fit_state, make_fit_optimizer

    fcfg = FitConfig(n_rand=1024)
    fstate = init_fit_state(jax.random.PRNGKey(4), fcfg, pose_spherical(0, 0, 16.0))
    ftx = make_fit_optimizer(fcfg)
    coords = jax.random.uniform(jax.random.PRNGKey(5), (1024, 2)) * 511
    targets = jax.random.uniform(jax.random.PRNGKey(6), (1024, 3))
    Kmat = jnp.asarray([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1.0]])

    # --- training: steps/sec of the full train step (texture encode + fold
    # + two-pass render + losses + Adam over everything; N_rand=1024)
    from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step

    tstate = create_train_state(jax.random.PRNGKey(7), spec)
    ttx = make_optimizer()
    tbatch = Batch(
        rays_o=jnp.zeros((1024, 3)),
        rays_d=rays_d[:1024],
        target_rgb=jax.random.uniform(jax.random.PRNGKey(8), (1024, 3)),
        shape_code=jnp.zeros(spec.shape_dim),
        exp_type=jnp.asarray(0, jnp.int32),
        uv_map=jax.random.uniform(jax.random.PRNGKey(9), (512, 512, 3)),
    )

    @jax.jit
    def loop_train(s, b):
        def body(i, carry):
            st, acc = carry
            st, m = train_step(st, b, jax.random.fold_in(jax.random.PRNGKey(10), i),
                               spec, ttx)
            return st, acc + m["loss"]
        return jax.lax.fori_loop(0, K_INNER, body, (s, 0.0))

    ts, _ = loop_train(tstate, tbatch)
    jax.block_until_ready(ts)
    t0 = time.perf_counter()
    ts, acc = loop_train(tstate, tbatch)
    float(acc)
    train_steps_per_sec = 1.0 / ((time.perf_counter() - t0) / K_INNER)

    @jax.jit
    def loop_fit(s, c, t):
        def body(i, carry):
            st, acc = carry
            st, loss = fit_step(params, spec, ftx, st, c + i * 1e-6, t, Kmat)
            return st, acc + loss
        return jax.lax.fori_loop(0, K_INNER, body, (s, 0.0))

    fs, _ = loop_fit(fstate, coords, targets)  # compile + warm
    jax.block_until_ready(fs)
    t0 = time.perf_counter()
    fs, acc = loop_fit(fstate, coords, targets)
    float(acc)
    sec_fit = (time.perf_counter() - t0) / K_INNER
    fit_iters_per_sec = 1.0 / sec_fit

    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(prod_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(prod_rays / BASELINE_RAYS_PER_SEC, 4),
                "extra": {
                    "mode": f"occupancy-culled (probe {S_PROBE}, keep {K_KEEP}, fine 10x1024 bf16)",
                    "sec_per_512x512_frame": round(512 * 512 / prod_rays, 3),
                    "reference_budget_rays_per_sec": round(ref_rays, 1),
                    "reference_budget_sec_per_frame": round(512 * 512 / ref_rays, 3),
                    "reference_budget_sustained_tflops": round(ref_flops / sec_ref / 1e12, 1),
                    "fit_iters_per_sec": round(fit_iters_per_sec, 2),
                    "train_steps_per_sec": round(train_steps_per_sec, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
