"""Perf experiment 3 (TPU): lean student MLP throughput + jitted full-frame."""
import json, time
import jax, jax.numpy as jnp

from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.render.serve import render_rays_bounded, render_frame_serve
from mofanerf_tpu.ops.rays import pose_spherical

K_INNER = 16
NEAR, FAR = 8.0, 26.0
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)
results = {}

def timed(fn, *args, k=K_INNER):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / k

def bench(tag, cfg, n_rays, s):
    params, cond = init_point_field(jax.random.PRNGKey(0), cfg)
    rd = jax.random.normal(jax.random.PRNGKey(1), (n_rays, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.zeros((n_rays, 3))

    @jax.jit
    def loop(o, d):
        def body(i, acc):
            out = render_rays_bounded(params, cfg, cond, o + i * 1e-6, d,
                                      NEAR, FAR, s, AABB_MIN, AABB_MAX)
            return acc + jnp.sum(out["rgb"])
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)

    sec = timed(loop, ro, rd)
    results[tag] = round(n_rays / sec, 1)

cfgs = {
    "m128d4mr10": StudentConfig(depth=4, width=128, multires=10),
    "m128d4mr8": StudentConfig(depth=4, width=128, multires=8),
    "m128d4mr6": StudentConfig(depth=4, width=128, multires=6),
    "m192d6mr8": StudentConfig(depth=6, width=192, multires=8, skip=3),
    "m256d8mr10": StudentConfig(depth=8, width=256, multires=10, skip=4),
}
for name, cfg in cfgs.items():
    for s in (16, 32):
        bench(f"{name}_S{s}_N8192", cfg, 8192, s)
bench("m128d4mr8_S32_N32768", cfgs["m128d4mr8"], 32768, 32)
bench("m128d4mr8_S16_N65536", cfgs["m128d4mr8"], 65536, 16)

# jitted full-frame serve: 512^2, static 0.5 budget
cfg = cfgs["m128d4mr8"]
params, cond = init_point_field(jax.random.PRNGKey(0), cfg)
K = jnp.asarray([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1]])
c2w = jnp.asarray(pose_spherical(20.0, -10.0, 16.0))[:3]

@jax.jit
def frame(params, cond, c2w):
    out = render_frame_serve(params, cfg, cond, 512, 512, K, c2w,
                             n_samples=32, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                             hit_fraction=0.5, packet_size=16384)
    return jnp.sum(out["rgb"])

@jax.jit
def frames8(params, cond, c2w):
    def body(i, acc):
        return acc + frame(params, cond, c2w + i * 1e-6)
    return jax.lax.fori_loop(0, 8, body, 0.0)

float(frames8(params, cond, c2w))
t0 = time.perf_counter(); float(frames8(params, cond, c2w))
results["frame512_m128d4mr8_S32_hf0.5_sec"] = round((time.perf_counter() - t0) / 8, 4)

print(json.dumps(results))
