"""Perf experiment 2 (TPU): student-field bounded-render throughput across
(width, depth, samples), plus flagship field on the bounded path, plus a
full-frame serve render timing."""
import json, time
import jax, jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig, init_field_params, fold_conditioning
from mofanerf_tpu.render.serve import render_rays_bounded, render_frame_serve
from mofanerf_tpu.ops.rays import pose_spherical

K_INNER = 16
NEAR, FAR = 8.0, 26.0
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)  # tight face box
results = {}

def timed(fn, *args, k=K_INNER):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / k

def bench_cfg(tag, cfg, n_rays, s):
    params = init_field_params(jax.random.PRNGKey(0), cfg)
    zc = jnp.zeros(cfg.shape_dim), jnp.zeros(cfg.exp_dim), jnp.zeros(cfg.tex_dim)
    cond = fold_conditioning(params, *zc)
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
    return params, cond

students = {
    "s128d4": FieldConfig(depth=4, width=128, shape_dim=1, exp_dim=1, tex_dim=1,
                          compute_dtype=jnp.bfloat16),
    "s192d6": FieldConfig(depth=6, width=192, shape_dim=1, exp_dim=1, tex_dim=1,
                          compute_dtype=jnp.bfloat16),
    "s256d8": FieldConfig(depth=8, width=256, shape_dim=1, exp_dim=1, tex_dim=1,
                          compute_dtype=jnp.bfloat16),
}
keep = {}
for name, cfg in students.items():
    for s in (16, 32, 64):
        keep[name] = bench_cfg(f"{name}_S{s}_N8192_rays_per_s", cfg, 8192, s)
# bigger packets on the middle student
for n in (32768,):
    for s in (16, 32):
        bench_cfg(f"s192d6_S{s}_N{n}_rays_per_s", students["s192d6"], n, s)
# flagship fine field through the bounded (grid-free) path
flag = FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16)
bench_cfg("flagship_bounded_S32_N8192_rays_per_s", flag, 8192, 32)

# full-frame serve render, 512^2, static budget 0.5 (one compile, no readback)
cfg = students["s192d6"]
params, cond = keep["s192d6"], None
params = init_field_params(jax.random.PRNGKey(0), cfg)
cond = fold_conditioning(params, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
K = jnp.asarray([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1]])
c2w = jnp.asarray(pose_spherical(20.0, -10.0, 16.0))[:3]

def frame():
    out = render_frame_serve(params, cfg, cond, 512, 512, K, c2w,
                             n_samples=32, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                             hit_fraction=0.5, packet_size=16384)
    return float(jnp.sum(out["rgb"]))

frame()  # warm/compile
t0 = time.perf_counter(); frame(); sec = time.perf_counter() - t0
results["frame_serve_512_s192d6_S32_sec"] = round(sec, 4)

print(json.dumps(results))
