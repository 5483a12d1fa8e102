"""Perf experiment 1 (TPU): realistic thin-shell grid keep-K timings and
baked trilinear-gather render feasibility."""
import json, time
import jax, jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.ops.occupancy import OccupancyGrid, render_rays_occupancy
from mofanerf_tpu.render.renderer import (
    MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning, exp_code_for,
)

N_RAYS = 8192
K_INNER = 16
results = {}

def timed(loop_fn, *args, k=K_INNER):
    float(loop_fn(*args))
    t0 = time.perf_counter()
    float(loop_fn(*args))
    return (time.perf_counter() - t0) / k

spec = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
    fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
    render=RenderConfig(n_coarse=64, n_importance=64),
)
params = init_model_params(jax.random.PRNGKey(0), spec)
cond = prepare_conditioning(params, spec, jnp.zeros(spec.shape_dim),
                            exp_code_for(params, 0), jnp.zeros(spec.tex_dim))

# ellipsoid shell occupancy (face-like: thin shell in a 10-unit box)
G = 64
t = (jnp.arange(G) + 0.5) / G * 10.0 - 5.0
X, Y, Z = jnp.meshgrid(t, t, t, indexing="ij")
r = jnp.sqrt((X / 2.2) ** 2 + (Y / 3.0) ** 2 + (Z / 2.5) ** 2)
occ_shell = jnp.abs(r - 1.0) < 0.12
results["shell_occupancy_frac"] = float(occ_shell.mean())
grid = OccupancyGrid(occ_shell, jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))

rays_d = jax.random.normal(jax.random.PRNGKey(1), (N_RAYS, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
rays_o = jnp.zeros((N_RAYS, 3)) + jnp.asarray([0.0, 0.0, 0.0])

for k_keep in (8, 16, 32):
    @jax.jit
    def loop(o, d, kk=k_keep):
        def body(i, acc):
            out = render_rays_occupancy(
                params["fine"], spec.fine, cond.fine, grid, o + i * 1e-6, d,
                spec.render.near, spec.render.far, 64, kk)
            return acc + jnp.sum(out["rgb"])
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)
    sec = timed(loop, rays_o, rays_d)
    results[f"shell_keep{k_keep}_rays_per_s"] = round(N_RAYS / sec, 1)

# --- baked trilinear render: density+rgb grids, S samples pure gathers
for GB, S in ((256, 32), (256, 64), (512, 32)):
    feat = jax.random.uniform(jax.random.PRNGKey(2), (GB * GB * GB, 4), jnp.bfloat16)
    lo, hi = -5.0, 5.0

    def baked_render(o, d, feat):
        z = jnp.linspace(8.0, 26.0, S)
        pts = o[:, None, :] + d[:, None, :] * z[None, :, None]  # [N,S,3]
        u = (pts - lo) / (hi - lo) * (GB - 1)
        u = jnp.clip(u, 0.0, GB - 1.001)
        i0 = jnp.floor(u).astype(jnp.int32)
        f = (u - i0).astype(jnp.bfloat16)
        acc = 0.0
        out = jnp.zeros(pts.shape[:-1] + (4,), jnp.bfloat16)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = ((i0[..., 0] + dx) * GB + (i0[..., 1] + dy)) * GB + (i0[..., 2] + dz)
                    w = (jnp.where(dx, f[..., 0], 1 - f[..., 0])
                         * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                         * jnp.where(dz, f[..., 2], 1 - f[..., 2]))
                    out = out + feat[idx] * w[..., None]
        sigma = out[..., 0].astype(jnp.float32)
        rgb = out[..., 1:].astype(jnp.float32)
        dists = (z[1] - z[0])
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
        T = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        T = jnp.concatenate([jnp.ones_like(T[..., :1]), T[..., :-1]], -1)
        w = alpha * T
        return (w[..., None] * jax.nn.sigmoid(rgb)).sum(1)

    @jax.jit
    def loop_b(o, d, feat):
        def body(i, acc):
            return acc + jnp.sum(baked_render(o + i * 1e-6, d, feat))
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)
    sec = timed(loop_b, rays_o, rays_d, feat)
    results[f"baked_G{GB}_S{S}_rays_per_s"] = round(N_RAYS / sec, 1)
    del feat

print(json.dumps(results))
