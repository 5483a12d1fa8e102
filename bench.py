"""Benchmark: render throughput (rays/sec/chip) on the flagship model.

Renders 512x512 frames at the reference's full sample budget (64 coarse +
64 importance, fine net 10x1024) in bfloat16 and reports steady-state ray
throughput on one chip. Baseline target: 5M rays/sec/chip (BASELINE.md).

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


def main() -> None:
    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
        fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
        render=RenderConfig(n_coarse=64, n_importance=64),
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(
        params,
        spec,
        jnp.zeros(spec.shape_dim),
        exp_code_for(params, 0),
        jnp.zeros(spec.tex_dim),
    )

    n = 4096  # rays per call; 4096x192 points keeps peak activations ~1 GB in bf16
    key = jax.random.PRNGKey(1)
    rays_d = jax.random.normal(key, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((n, 3))

    fn = jax.jit(lambda p, c, o, d: render_rays(p, spec, c, o, d)["rgb"])

    # compile + warmup
    fn(params, cond, rays_o, rays_d).block_until_ready()

    iters = 16
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, cond, rays_o, rays_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_sec = n * iters / dt
    sec_per_frame = 512 * 512 / rays_per_sec
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
                "extra": {
                    "sec_per_512x512_frame": round(sec_per_frame, 4),
                    "samples_per_ray": 192,
                    "fine_net": "10x1024 bf16",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
