"""Diagnose flagship-width training: are steps being skipped (non-finite
grads) and does sigma actually move?"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
import imageio.v2 as imageio

from mofanerf_tpu.datagen.multiview import render_identity
from mofanerf_tpu.data.facescape import load_facescape_data
from mofanerf_tpu.models.field import FieldConfig, fold_conditioning
from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig
from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step
from mofanerf_tpu.ops.rays import get_rays_at
from mofanerf_tpu.ops.occupancy import probe_density, OccupancyGrid

OUT = "/tmp/lm_anneal"
data_dir = os.path.join(OUT, "data")
ds = load_facescape_data(data_dir, [0], np.zeros((300, 50), np.float32), testskip=1)
H, W, focal = ds.hwf
K = np.array([[focal, 0, W/2], [0, focal, H/2], [0, 0, 1]], np.float32)

spec = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
    fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
    render=RenderConfig(n_coarse=32, n_importance=32, packet_size=4096,
                        raw_noise_std=1.0),
    uv_size=128,
)
tx = make_optimizer(lrate=5e-4)
step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))
uv = jnp.full((128, 128, 3), 0.5)
images = {}
rng = np.random.default_rng(0)

def batch_for(i, frac=0.5):
    img_i = int(rng.choice(ds.i_split[0]))
    if img_i not in images:
        img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
        images[img_i] = img[..., :3]
    target = images[img_i]
    n = 1024
    n_fg = int(n * frac)
    fg_r, fg_c = np.nonzero(target.sum(-1) > 0.05)
    pick = rng.integers(0, fg_r.shape[0], n_fg)
    fg = np.stack([fg_r[pick], fg_c[pick]], -1)
    uni = np.stack([rng.integers(0, H, n - n_fg), rng.integers(0, W, n - n_fg)], -1)
    coords = np.concatenate([fg, uni], 0).astype(np.int64)
    ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                         jnp.asarray(ds.poses[img_i]))
    return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                 jnp.zeros(50), jnp.asarray(0), uv)

state = create_train_state(jax.random.PRNGKey(0), spec, lrate=5e-4)
G = 16
grid = OccupancyGrid(jnp.zeros((G, G, G), bool),
                     jnp.asarray([-2.2]*3), jnp.asarray([2.2]*3))

@jax.jit
def sigma_stats(params):
    from mofanerf_tpu.render.renderer import prepare_conditioning, encode_texture, exp_code_for
    tex = encode_texture(params, spec, uv)
    cond = prepare_conditioning(params, spec, jnp.zeros(50),
                                exp_code_for(params, 0), tex)
    sig = probe_density(params["fine"], spec.fine, cond.fine, grid, chunk=4096)
    return jnp.mean(sig), jnp.std(sig), jnp.max(sig)

ok_count = 0
for i in range(400):
    state, m = step_fn(state, batch_for(i), jax.random.PRNGKey(i))
    ok_count += int(m["step_ok"])
    if (i + 1) % 50 == 0:
        mu, sd, mx = sigma_stats(state.params)
        print(f"step {i+1}: loss {float(m['loss']):.4f} ok_frac "
              f"{ok_count/(i+1):.2f} sigma mean {float(mu):.3f} "
              f"std {float(sd):.3f} max {float(mx):.3f}", flush=True)
