"""Diagnose the scrambled refine_corpus32 renders: render ONE faces32hi view
from the morphable32 checkpoint via (a) the full-quality render_frame and
(b) the occupancy render_frame_fast used by the corpus CLI, and compare
both to the dataset GT. Prints PSNRs + grid stats, saves a triptych."""
import os, sys, json
import numpy as np
import jax, jax.numpy as jnp
import imageio.v2 as imageio

sys.path.insert(0, "/root/repo")
from mofanerf_tpu.config import load_config
from mofanerf_tpu.data.facescape import (
    load_facescape_data, load_shape_codes, read_image, valid_persons)
from mofanerf_tpu.render.renderer import (
    prepare_conditioning, render_frame, encode_texture, exp_code_for)
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
from mofanerf_tpu.train.state import create_train_state
from mofanerf_tpu.utils.metrics import to8b

cfg = load_config([
    "--expname", "morphable32", "--basedir", "studydata/logs",
    "--datadir", "studydata/faces32hi",
    "--uvdir", "studydata/faces32hi/uv",
    "--shape_codes_path", "studydata/faces32hi/factors_id.npy",
    "--person_num", "32", "--white_bkgd", "True",
])
spec = cfg.model_spec()
state = create_train_state(jax.random.PRNGKey(0), spec)
ckpt = os.path.join(cfg.basedir, cfg.expname, "checkpoints")
state = restore_checkpoint(ckpt, state)
print("ckpt step", int(state.step))
params = state.params

persons = valid_persons(cfg.datadir, cfg.person_num)
codes = load_shape_codes(cfg.shape_codes_path)
ds = load_facescape_data(cfg.datadir, persons, codes, uvdir=cfg.uvdir, testskip=0)
H0, W0, focal0 = ds.hwf
print("ds.hwf", H0, W0, focal0)
res = 256
scale = res / H0
K = jnp.asarray([[focal0 * scale, 0, .5 * res], [0, focal0 * scale, .5 * res], [0, 0, 1]])

# pick the manifest's 0/0/00.png frame so we compare the exact same view
man = json.load(open("studydata/refine_corpus32/train/gt_manifest.json"))
gt_path = man["0/0/00.png"]
fi = ds.image_paths.index(gt_path)
print("frame", fi, gt_path, "id", int(ds.id_codes[fi]), "exp", int(ds.exp_types[fi]))
c2w = jnp.asarray(ds.poses[fi][:3])
gt = np.asarray(read_image(gt_path, white_bkgd=True))
if gt.shape[0] != res:
    gt = np.asarray(jax.image.resize(jnp.asarray(gt), (res, res, 3), "linear"))

uv = read_image(ds.uv_paths[int(ds.id_codes[fi])], is_uvmap=True, uv_size=spec.uv_size)
tex = encode_texture(params, spec, jnp.asarray(uv))
cond = prepare_conditioning(params, spec, jnp.asarray(codes[int(ds.id_codes[fi])]),
                            exp_code_for(params, int(ds.exp_types[fi])), tex)

def psnr(a, b):
    return float(-10 * np.log10(max(np.mean((a - b) ** 2), 1e-12)))

# (a) full-quality
rgb_full = np.asarray(render_frame(params, spec, cond, res, res, K, c2w)["rgb"])
print("FULL  psnr vs GT:", psnr(rgb_full, gt))

# (b) occupancy fast path, as the corpus CLI does
from mofanerf_tpu.ops.occupancy import build_proposal_grid, render_frame_fast
grid = build_proposal_grid(params, spec, cond)
print("grid occupied fraction:", float(jnp.mean(grid.occ)))
from mofanerf_tpu.ops.occupancy import ray_aabb_hit
from mofanerf_tpu.ops.rays import get_rays
ro, rd = get_rays(res, res, K, c2w)
hit = ray_aabb_hit(grid, ro.reshape(-1, 3), rd.reshape(-1, 3),
                   spec.render.near, spec.render.far)
print("slab hit fraction:", float(jnp.mean(hit)), "near/far",
      spec.render.near, spec.render.far)
rgb_fast = np.asarray(render_frame_fast(params, spec, cond.fine, grid,
                                        res, res, K, c2w)["rgb"])
print("FAST  psnr vs GT:", psnr(rgb_fast, gt))
print("FAST  psnr vs FULL:", psnr(rgb_fast, rgb_full))

trip = np.concatenate([to8b(rgb_full), to8b(rgb_fast), to8b(gt)], axis=1)
imageio.imwrite("/tmp/diag_corpus32.png", trip)
print("wrote /tmp/diag_corpus32.png")
