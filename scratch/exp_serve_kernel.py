"""Measure fused serving-kernel layout variants on the real chip.

Sweeps rays-per-program (block_r) and the merged sigma|feat head at the
bench headline config (student 4x128 mr8 bf16, N=65536 rays), S in {16,32}.
Device-looped timing per bench.py methodology (relay readbacks lie).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scratch/exp_serve_kernel.py
"""
import time
import json

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused

NEAR, FAR = 8.0, 26.0
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)
CFG = StudentConfig(depth=4, width=128, multires=8)
K_INNER = 16
N = 65536


def unit_rays(key, n):
    d = jax.random.normal(key, (n, 3))
    return jnp.zeros((n, 3)), d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    sp, _ = init_point_field(jax.random.PRNGKey(0), CFG)
    ro, rd = unit_rays(jax.random.PRNGKey(1), N)

    results = {}
    for S in (32, 16):
        for block_r in (256, 512, 1024, 2048):
            name = f"S{S}_R{block_r}"

            @jax.jit
            def loop(o, d, S=S, block_r=block_r):
                def body(i, acc):
                    out = render_rays_bounded_fused(
                        sp, CFG, o + i * 1e-6, d, NEAR, FAR, S,
                        AABB_MIN, AABB_MAX, block_r=block_r)
                    return acc + jnp.sum(out["rgb"])
                return jax.lax.fori_loop(0, K_INNER, body, 0.0)

            try:
                t0 = time.perf_counter()
                float(loop(ro, rd))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(ro, rd))
                sec = (time.perf_counter() - t0) / K_INNER
                rps = N / sec
                results[name] = round(rps, 1)
                print(f"{name}: {rps/1e6:.2f}M rays/s "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
                print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
