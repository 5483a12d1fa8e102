"""Benchmark: render throughput (rays/sec/chip) on the flagship model.

Renders ray packets at the reference's full sample budget (64 coarse + 64
importance; fine pass sees all 128 — configs/exp_mofanerf.txt:16-17,
models/render_class.py:328) with the reference-dim networks (coarse 8x256,
fine 10x1024) in bfloat16, and reports steady-state ray throughput on one
chip.

Timing methodology: the iteration loop runs INSIDE one jit via
`lax.fori_loop` and a single scalar is read back. On this environment the
TPU is reached through a relay where `block_until_ready` returns before
execution finishes and every host readback costs ~200 ms — naive per-call
timing reports physically impossible numbers (>200 PFLOP/s). Device-looped
timing matches the chip's achievable FLOP/s (~70% of bf16 peak).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    RenderConfig,
    init_model_params,
    prepare_conditioning,
    render_rays,
    exp_code_for,
)

BASELINE_RAYS_PER_SEC = 5e6
N_RAYS = 4096   # per render call; 4096 x 128 x 1024-wide keeps activations ~1 GB
K_INNER = 16    # renders per timed jit


def device_looped_seconds_per_render(spec, params, cond, rays_o, rays_d, k=K_INNER):
    @jax.jit
    def run(o, d):
        def body(i, acc):
            # tiny input perturbation defeats any loop-invariant hoisting
            out = render_rays(params, spec, cond, o + i * 1e-6, d)["rgb"]
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, body, 0.0)

    float(run(rays_o, rays_d))  # compile + warm
    t0 = time.perf_counter()
    float(run(rays_o, rays_d))  # blocks via scalar readback
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

    sec = device_looped_seconds_per_render(spec, params, cond, rays_o, rays_d)
    rays_per_sec = N_RAYS / sec
    sec_per_frame = 512 * 512 / rays_per_sec

    # fast mode: fine pass on importance samples only (RenderConfig.fine_on_union)
    import dataclasses as _dc
    fast_spec = _dc.replace(spec, render=_dc.replace(spec.render, fine_on_union=False))
    sec_fast = device_looped_seconds_per_render(fast_spec, params, cond, rays_o, rays_d)
    fast_rays_per_sec = N_RAYS / sec_fast
    # 22 hidden-width matmul layers per trunk pair + xyz encoder (see
    # models/field.py); per-point FLOPs dominated by the fine 10x1024 net.
    flops_per_call = N_RAYS * 128 * (22 * 2 * 1024 * 1024) + N_RAYS * 64 * (
        22 * 2 * 256 * 256
    )
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
                "extra": {
                    "sec_per_512x512_frame": round(sec_per_frame, 3),
                    "sustained_tflops": round(flops_per_call / sec / 1e12, 1),
                    "samples_per_ray": 192,
                    "fine_net": "10x1024 bf16",
                    "fast_mode_rays_per_sec": round(fast_rays_per_sec, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
