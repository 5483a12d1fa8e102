"""Does apply_field_sigma (occupancy probe) agree with apply_field_folded
(render path) on the morphable32 checkpoint? Evaluate both at the same 3D
points along one camera ray + at box corners, same conditioning."""
import os, sys
import numpy as np
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mofanerf_tpu.config import Config
from mofanerf_tpu.data.facescape import (
    load_facescape_data, load_shape_codes, read_image)
from mofanerf_tpu.render.renderer import (
    encode_texture, exp_code_for, prepare_conditioning)
from mofanerf_tpu.train.checkpoint import restore_checkpoint
from mofanerf_tpu.train.state import create_train_state
from mofanerf_tpu.models.field import apply_field_sigma, apply_field_folded
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.composite import sigma_act
from mofanerf_tpu.ops.rays import get_rays

DATA = "studydata/faces32hi"
cfg = Config(expname="morphable32", basedir="studydata/logs", datadir=DATA,
             uvdir=os.path.join(DATA, "uv"),
             shape_codes_path=os.path.join(DATA, "factors_id.npy"),
             person_num=32, white_bkgd=True)
spec = cfg.model_spec()
state = create_train_state(jax.random.PRNGKey(0), spec)
state = restore_checkpoint(os.path.join(cfg.basedir, cfg.expname, "checkpoints"), state)
params = state.params
print("step", int(state.step))

codes = load_shape_codes(cfg.shape_codes_path)
ds = load_facescape_data(cfg.datadir, [0], codes, uvdir=cfg.uvdir, testskip=0)
H, W, focal = ds.hwf
K = jnp.asarray([[focal, 0, .5 * W], [0, focal, .5 * H], [0, 0, 1.]])
uv = read_image(ds.uv_paths[0], is_uvmap=True, uv_size=spec.uv_size)
tex = encode_texture(params, spec, jnp.asarray(uv))
cond = prepare_conditioning(params, spec, jnp.asarray(codes[0]),
                            exp_code_for(params, 0), tex)
c2w = jnp.asarray(ds.poses[0][:3])

ro, rd = get_rays(H, W, K, c2w)
o, d = ro[H // 2, W // 2], rd[H // 2, W // 2]
z = jnp.linspace(8.0, 26.0, 64)
pts = o[None] + d[None] * z[:, None]                      # center ray
corners = jnp.asarray([[-5., -5., -5.], [5., 5., 5.], [-5., 5., -5.],
                       [0., 0., 0.], [4.9, 0., 0.], [0., 4.9, 0.]])
allpts = jnp.concatenate([pts, corners], 0)

pe = fourier_embed(allpts, spec.fine.multires)
sig_probe = apply_field_sigma(params["fine"], cond.fine, pe, spec.fine)[:, 0]

viewdirs = d / jnp.linalg.norm(d)
de = fourier_embed(jnp.tile(viewdirs[None], (allpts.shape[0], 1)),
                   spec.fine.multires_views)
dirf = de @ params["fine"]["view"]["w_dirs"]
_, sig_fold = apply_field_folded(params["fine"], cond.fine, pe, dirf,
                                 spec.fine, samples_per_ray=1)
sig_fold = sig_fold.reshape(-1)

act = sigma_act(spec.render.sigma_activation)
a_probe = np.asarray(act(sig_probe), np.float32)
a_fold = np.asarray(act(sig_fold), np.float32)
print("max |probe - fold| raw:", float(jnp.max(jnp.abs(sig_probe - sig_fold))))
print("ray: z, act_probe, act_fold")
for i in range(0, 64, 4):
    print(f"  z={float(z[i]):6.2f}  probe={a_probe[i]:10.3f}  fold={a_fold[i]:10.3f}")
print("corners (outside head, maybe outside frustum):")
for i, c in enumerate(np.asarray(corners)):
    print(f"  {c}  probe={a_probe[64+i]:10.3f}  fold={a_fold[64+i]:10.3f}")
