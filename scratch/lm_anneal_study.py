"""Does the lm_frac anneal fix the flagship-width fog failure?

Round-1 finding: foreground-biased sampling at fixed lm_frac=0.6 trained
fog (acc=1 everywhere) on the sparse toy scene at flagship width, while
uniform sampling underfit. This study trains FLAGSHIP dims (8x256 coarse +
10x1024 fine) on the synthetic cube three ways — uniform, fixed 0.6 bias,
annealed 0->0.6 bias — and records loss/psnr/mean-background-acc.
"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
import imageio.v2 as imageio

from mofanerf_tpu.datagen.multiview import render_identity
from mofanerf_tpu.data.facescape import load_facescape_data
from mofanerf_tpu.data.landmarks import anneal_lm_frac
from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.render.renderer import (
    MoFaNeRF, RenderConfig, prepare_conditioning, render_frame,
    encode_texture, exp_code_for,
)
from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step
from mofanerf_tpu.ops.rays import get_rays_at

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
OUT = "/tmp/lm_anneal"

data_dir = os.path.join(OUT, "data")
os.makedirs(data_dir, exist_ok=True)
v = np.array([[-1,-1,-1],[1,-1,-1],[1,1,-1],[-1,1,-1],
              [-1,-1,1],[1,-1,1],[1,1,1],[-1,1,1]], np.float64) * 1.6
f = np.array([[0,1,2],[0,2,3],[4,6,5],[4,7,6],[0,4,5],[0,5,1],
              [1,5,6],[1,6,2],[2,6,7],[2,7,3],[3,7,4],[3,4,0]], np.int32)
render_identity(0, {0: (v, f)}, data_dir, res=64)
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

def batch_for(rng, i, mode):
    img_i = int(rng.choice(ds.i_split[0]))
    if img_i not in images:
        img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
        images[img_i] = img[..., :3]
    target = images[img_i]
    if mode == "uniform":
        frac = 0.0
    elif mode == "fixed":
        frac = 0.6
    else:
        frac = anneal_lm_frac(i, 0.6, ITERS // 2)
    n = 1024
    n_fg = int(n * frac)
    fg_r, fg_c = np.nonzero(target.sum(-1) > 0.05)
    pick = rng.integers(0, fg_r.shape[0], n_fg) if n_fg else np.empty(0, int)
    fg = np.stack([fg_r[pick], fg_c[pick]], -1) if n_fg else np.empty((0, 2), int)
    uni = np.stack([rng.integers(0, H, n - n_fg), rng.integers(0, W, n - n_fg)], -1)
    coords = np.concatenate([fg, uni], 0).astype(np.int64)
    ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                         jnp.asarray(ds.poses[img_i]))
    return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                 jnp.zeros(50), jnp.asarray(0), uv)

results = {}
for mode in ("uniform", "fixed", "anneal"):
    rng = np.random.default_rng(0)
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=5e-4)
    t0 = time.time()
    losses = []
    for i in range(ITERS):
        state, m = step_fn(state, batch_for(rng, i, mode), jax.random.PRNGKey(i))
        if (i + 1) % 200 == 0:
            losses.append(round(float(m["loss"]), 4))
            print(f"[{mode}] {i+1}/{ITERS} loss {float(m['loss']):.4f} "
                  f"({(i+1)/(time.time()-t0):.1f} it/s)", flush=True)
    # held-out render: fog = high acc on true-background pixels
    tex = encode_texture(state.params, spec, uv)
    cond = prepare_conditioning(state.params, spec, jnp.zeros(50),
                                exp_code_for(state.params, 0), tex)
    ti = int(ds.i_split[2][0])
    frame = jax.jit(lambda p, c: render_frame(p, spec, c, H, W, jnp.asarray(K),
                                              jnp.asarray(ds.poses[ti][:3])))
    out = frame(state.params, cond)
    gt = imageio.imread(ds.image_paths[ti]).astype(np.float32)[..., :3] / 255.0
    bg = gt.sum(-1) < 0.05
    acc = np.asarray(out["acc"])
    rgb = np.asarray(out["rgb"])
    psnr = float(-10 * np.log10(np.mean((rgb - gt) ** 2) + 1e-12))
    results[mode] = {
        "loss_trace": losses,
        "heldout_psnr_db": round(psnr, 2),
        "bg_acc_mean": round(float(acc[bg].mean()), 4),
        "fg_acc_mean": round(float(acc[~bg].mean()), 4),
    }
    print(f"[{mode}] psnr {psnr:.2f} bg_acc {acc[bg].mean():.3f} "
          f"fg_acc {acc[~bg].mean():.3f}", flush=True)

print(json.dumps(results))
with open("/root/repo/artifacts/lm_anneal.json", "w") as fh:
    json.dump({"iters": ITERS, "dims": "8x256 + 10x1024 bf16",
               "scene": "synthetic cube 64x64", "modes": results}, fh, indent=1)
