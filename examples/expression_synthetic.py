"""Expression-conditioning demo: one identity, two expressions.

Trains one model on two "expressions" of the same identity (a small and a
large cube) and verifies the learned expression latents control rendered
geometry: rendering with expression 0 produces the small shape, expression
1 the large one. Completes the conditioning-axis proofs alongside
examples/morphable_synthetic.py (identity + fitting) and
examples/train_synthetic.py (end-to-end basics). Runs on TPU or --cpu-less
envs in ~3 minutes with no external data.

Usage: PYTHONPATH=. python examples/expression_synthetic.py
"""
import time, os, numpy as np, jax, jax.numpy as jnp
import imageio.v2 as imageio
from mofanerf_tpu.datagen.multiview import render_identity
from mofanerf_tpu.data.facescape import load_facescape_data
from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.render.renderer import (MoFaNeRF, RenderConfig, prepare_conditioning,
    render_frame, encode_texture, exp_code_for)
from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step
from mofanerf_tpu.ops.rays import get_rays_at

import sys
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mofanerf_expdemo"
os.makedirs(out, exist_ok=True)
cube = lambda s: (np.array([[-1,-1,-1],[1,-1,-1],[1,1,-1],[-1,1,-1],[-1,-1,1],[1,-1,1],[1,1,1],[-1,1,1]],float)*s,
                  np.array([[0,1,2],[0,2,3],[4,6,5],[4,7,6],[0,4,5],[0,5,1],[1,5,6],[1,6,2],[2,6,7],[2,7,3],[3,7,4],[3,4,0]],np.int32))
render_identity(0, {0: cube(1.0), 1: cube(2.2)}, f"{out}/data", res=64)
ds = load_facescape_data(f"{out}/data", [0], np.zeros((300,50),np.float32), testskip=1)
H, W, focal = ds.hwf
K = np.array([[focal,0,W/2],[0,focal,H/2],[0,0,1]], np.float32)

spec = MoFaNeRF(coarse=FieldConfig(depth=8,width=64), fine=FieldConfig(depth=8,width=128),
                render=RenderConfig(n_coarse=32,n_importance=32,packet_size=4096,raw_noise_std=1.0), uv_size=128)
state = create_train_state(jax.random.PRNGKey(0), spec, lrate=1e-3)
tx = make_optimizer(lrate=1e-3)
step = jax.jit(lambda s,b,k: train_step(s,b,k,spec,tx))
rng = np.random.default_rng(0)
uv = jnp.full((128,128,3), 0.5)
imgs = {}
def batch(i):
    ii = int(rng.choice(ds.i_split[0]))
    if ii not in imgs:
        imgs[ii] = imageio.imread(ds.image_paths[ii]).astype(np.float32)[...,:3]/255.
    t = imgs[ii]
    fr, fc = np.nonzero(t.sum(-1) > 0.05)
    nf = min(614, fr.shape[0]); pick = rng.integers(0, fr.shape[0], nf)
    coords = np.concatenate([np.stack([fr[pick], fc[pick]],-1),
        np.stack([rng.integers(0,H,1024-nf), rng.integers(0,W,1024-nf)],-1)],0)
    ro, rd = get_rays_at(jnp.asarray(coords,jnp.float32), jnp.asarray(K), jnp.asarray(ds.poses[ii]))
    return Batch(ro, rd, jnp.asarray(t[coords[:,0],coords[:,1]]), jnp.zeros(50),
                 jnp.asarray(int(ds.exp_types[ii])), uv)
t0=time.time()
for i in range(2500):
    state, m = step(state, batch(i), jax.random.PRNGKey(i))
    if i % 500 == 0: print(f"iter {i} loss {float(m['loss']):.4f} ({(i+1)/(time.time()-t0):.1f} it/s)", flush=True)

tex = encode_texture(state.params, spec, uv)
pose = jnp.asarray(ds.poses[int(ds.i_split[2][0])][:3])
area = {}
for e in (0, 1):
    cond = prepare_conditioning(state.params, spec, jnp.zeros(50), exp_code_for(state.params, e), tex)
    o = render_frame(state.params, spec, cond, H, W, jnp.asarray(K), pose)
    area[e] = float((np.asarray(o["acc"]) > 0.5).mean())
    imageio.imwrite(f"{out}/exp{e}.png", (np.clip(np.asarray(o['rgb']),0,1)*255).astype(np.uint8))
print(f"coverage exp0 (small cube): {area[0]:.3f}  exp1 (large cube): {area[1]:.3f}")
assert area[1] > area[0] * 1.5, "expression latents do not control geometry"
print("EXPRESSION CONTROL OK")
