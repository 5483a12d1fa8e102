"""Diagnose: why do distilled students of the exp0 (small-cube) teacher
render empty while exp1 (large-cube) students hit 28 dB?

Probes teacher + student sigma along a center ray and at volume points,
across seeds and sample counts. TPU.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
import imageio.v2 as imageio

sys.path.insert(0, "/root/repo")
from mofanerf_tpu.datagen.multiview import render_identity
from mofanerf_tpu.data.facescape import load_facescape_data
from mofanerf_tpu.models.field import FieldConfig, fold_conditioning
from mofanerf_tpu.render.renderer import (MoFaNeRF, RenderConfig,
    prepare_conditioning, render_frame, encode_texture, exp_code_for)
from mofanerf_tpu.render.serve import render_frame_serve, render_rays_bounded
from mofanerf_tpu.train.distill import (DistillConfig, distill, _field_outputs)
from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step
from mofanerf_tpu.ops.rays import get_rays_at

out = "/tmp/mofanerf_diagdx"
aabb_min, aabb_max = (-3.0,)*3, (3.0,)*3
cube = lambda s: (np.array([[-1,-1,-1],[1,-1,-1],[1,1,-1],[-1,1,-1],[-1,-1,1],[1,-1,1],[1,1,1],[-1,1,1]],float)*s,
                  np.array([[0,1,2],[0,2,3],[4,6,5],[4,7,6],[0,4,5],[0,5,1],[1,5,6],[1,6,2],[2,6,7],[2,7,3],[3,7,4],[3,4,0]],np.int32))
data_dir = os.path.join(out, "data")
os.makedirs(data_dir, exist_ok=True)
render_identity(0, {0: cube(1.0), 1: cube(2.2)}, data_dir, res=64)
ds = load_facescape_data(data_dir, [0], np.zeros((300,50),np.float32), testskip=1)
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
def batch():
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
for i in range(2000):
    state, m = step(state, batch(), jax.random.PRNGKey(i))
print(f"teacher trained {time.time()-t0:.0f}s loss {float(m['loss']):.4f}", flush=True)
params = state.params
tex = encode_texture(params, spec, uv)
shape = jnp.zeros(50)

# probe teacher sigma along the +z center ray for each expression
zline = jnp.linspace(-3, 3, 61)
pts = jnp.stack([jnp.zeros_like(zline), jnp.zeros_like(zline), zline], -1)
dirs = jnp.tile(jnp.asarray([[0.,0,-1.]]), (61,1))
for e in (0,1):
    cond = prepare_conditioning(params, spec, shape, exp_code_for(params, e), tex)
    _, sig = _field_outputs(params["fine"], spec.fine, cond.fine, pts, dirs)
    s = np.asarray(sig)
    print(f"teacher exp{e}: sigma center-ray max={s.max():.1f} "
          f"inside[|z|<0.9] mean={s[np.abs(np.asarray(zline))<0.9].mean():.1f} "
          f"outside[|z|>2.5] mean={s[np.abs(np.asarray(zline))>2.5].mean():.2f}", flush=True)

# distill uncond for each exp, seeds 0/1, probe student
test_pose = jnp.asarray(ds.poses[int(ds.i_split[2][0])])[:3]
serve_kw = dict(near=8.0, far=26.0, n_samples=32, aabb_min=aabb_min,
                aabb_max=aabb_max, packet_size=1024, hit_fraction=1.0)
for e in (0,1):
    cond = prepare_conditioning(params, spec, shape, exp_code_for(params, e), tex)
    teacher_img = np.asarray(render_frame(params, spec, cond, H, W, jnp.asarray(K), test_pose)["rgb"])
    for seed in (0,1):
        dcfg = DistillConfig(n_steps=1500, batch=8192, aabb_min=aabb_min, aabb_max=aabb_max)
        st, scfg = distill(params["fine"], spec.fine, cond.fine, dcfg, seed=seed,
                           log_every=500)
        _, sig_s = _field_outputs(st.params, scfg, st.cond, pts, dirs)
        ss = np.asarray(sig_s)
        o = render_frame_serve(st.params, scfg, st.cond, H, W, jnp.asarray(K),
                               test_pose, **serve_kw)
        acc = np.asarray(o["acc"])
        mse = float(np.mean((np.asarray(o["rgb"]) - teacher_img)**2))
        print(f"exp{e} seed{seed}: student sigma inside={ss[np.abs(np.asarray(zline))<0.9].mean():.1f} "
              f"max={ss.max():.1f}; render acc mean={acc.mean():.3f} max={acc.max():.3f} "
              f"psnr={-10*np.log10(max(mse,1e-10)):.1f}", flush=True)
