"""v3: reference lr (5e-5) + precrop + anneal at flagship dims, long run,
plus optional softplus sigma activation (arg 2: relu|softplus)."""
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
ACT = sys.argv[2] if len(sys.argv) > 2 else "relu"
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 5e-5
PRECROP = 500

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

rc = dict(n_coarse=32, n_importance=32, packet_size=4096, raw_noise_std=1.0)
try:
    rcfg = RenderConfig(sigma_activation=ACT, **rc)
except TypeError:
    assert ACT == "relu"
    rcfg = RenderConfig(**rc)
spec = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
    fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
    render=rcfg, uv_size=128,
)
tx = make_optimizer(lrate=LR)
step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))
uv = jnp.full((128, 128, 3), 0.5)
images = {}
rng = np.random.default_rng(0)

def batch_for(i):
    img_i = int(rng.choice(ds.i_split[0]))
    if img_i not in images:
        img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
        images[img_i] = img[..., :3]
    target = images[img_i]
    n = 1024
    if i < PRECROP:
        dH, dW = H // 4, W // 4
        coords = np.stack([rng.integers(H//2-dH, H//2+dH, n),
                           rng.integers(W//2-dW, W//2+dW, n)], -1).astype(np.int64)
    else:
        frac = anneal_lm_frac(max(0, i - PRECROP), 0.6, 2000)
        n_fg = int(n * frac)
        fg_r, fg_c = np.nonzero(target.sum(-1) > 0.05)
        pick = rng.integers(0, fg_r.shape[0], n_fg) if n_fg else np.empty(0, int)
        fg = np.stack([fg_r[pick], fg_c[pick]], -1) if n_fg else np.empty((0, 2), int)
        uni = np.stack([rng.integers(0, H, n-n_fg), rng.integers(0, W, n-n_fg)], -1)
        coords = np.concatenate([fg, uni], 0).astype(np.int64)
    ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                         jnp.asarray(ds.poses[img_i]))
    return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                 jnp.zeros(50), jnp.asarray(0), uv)

ti = int(ds.i_split[2][0])
gt = imageio.imread(ds.image_paths[ti]).astype(np.float32)[..., :3] / 255.0
bg = gt.sum(-1) < 0.05
frame = jax.jit(lambda p, c: render_frame(p, spec, c, H, W, jnp.asarray(K),
                                          jnp.asarray(ds.poses[ti][:3])))

def probe(state):
    tex = encode_texture(state.params, spec, uv)
    cond = prepare_conditioning(state.params, spec, jnp.zeros(50),
                                exp_code_for(state.params, 0), tex)
    out = frame(state.params, cond)
    acc = np.asarray(out["acc"]); rgb = np.asarray(out["rgb"])
    return {"psnr": round(float(-10*np.log10(np.mean((rgb-gt)**2)+1e-12)), 2),
            "bg_acc": round(float(acc[bg].mean()), 3),
            "fg_acc": round(float(acc[~bg].mean()), 3)}

name = f"precrop_anneal_{ACT}_lr{LR}"
art = "/root/repo/artifacts/lm_anneal.json"


def save_trace(trace):
    # incremental: an interrupted run still records its curve
    data = json.load(open(art)) if os.path.exists(art) else {}
    data.setdefault("long_runs", {})[name] = {"iters": ITERS, "trace": trace}
    json.dump(data, open(art, "w"), indent=1)


state = create_train_state(jax.random.PRNGKey(0), spec, lrate=LR)
t0 = time.time()
trace = []
PROBE_EVERY = max(2000, ITERS // 12)
for i in range(ITERS):
    state, m = step_fn(state, batch_for(i), jax.random.PRNGKey(i))
    if (i + 1) % PROBE_EVERY == 0 or i + 1 == ITERS:
        pr = probe(state); pr["iter"] = i + 1; pr["loss"] = round(float(m["loss"]), 4)
        trace.append(pr)
        save_trace(trace)
        print(f"[{ACT} lr={LR}] {i+1}/{ITERS} {pr} "
              f"({(i+1)/(time.time()-t0):.1f} it/s)", flush=True)

print("saved", name)
