"""Perf experiment 4 (TPU): compiled fused Pallas serve kernel vs XLA path."""
import json, time
import jax, jax.numpy as jnp

from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused
from mofanerf_tpu.render.serve import render_rays_bounded

K_INNER = 16
NEAR, FAR = 8.0, 26.0
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)
results = {}

def timed(fn, *args, k=K_INNER):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / k

cfg = StudentConfig(depth=4, width=128, multires=8)
params, cond = init_point_field(jax.random.PRNGKey(0), cfg)

for n, s in ((8192, 32), (32768, 32), (65536, 16), (65536, 32)):
    rd = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.zeros((n, 3))

    @jax.jit
    def loop_fused(o, d, _s=s):
        def body(i, acc):
            out = render_rays_bounded_fused(params, cfg, o + i * 1e-6, d,
                                            NEAR, FAR, _s, AABB_MIN, AABB_MAX)
            return acc + jnp.sum(out["rgb"])
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)

    sec = timed(loop_fused, ro, rd)
    results[f"fused_S{s}_N{n}_rays_per_s"] = round(n / sec, 1)

# numerical check compiled vs XLA on TPU
n = 8192
rd = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
ro = jnp.zeros((n, 3))
a = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 32, AABB_MIN, AABB_MAX)
b = render_rays_bounded(params, cfg, cond, ro, rd, NEAR, FAR, 32, AABB_MIN, AABB_MAX)
import numpy as np
err = float(jnp.max(jnp.abs(a["rgb"] - b["rgb"])))
results["fused_vs_xla_max_abs_err"] = round(err, 6)

print(json.dumps(results))
