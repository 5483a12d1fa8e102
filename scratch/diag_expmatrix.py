"""Full 20x20 expression (code x GT) PSNR matrix for morphable16x20r5.

For each of 2 identities and 2 held-out poses: render the face with every
expression code, rasterize the TRUE face of every expression at the same
pose, and score all (code, gt_exp) pairs. Diagonal dominance per row
answers whether the code actually controls the face (vs the noisy
own-vs-exp0 margin in the eval, which is bounded by model error)."""
import os, sys, json
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mofanerf_tpu.config import Config
from mofanerf_tpu.data.facescape import (
    load_facescape_data, load_shape_codes, read_image)
from mofanerf_tpu.datagen.rasterize import rasterize_mesh
from mofanerf_tpu.datagen.synthetic_faces import face_mesh
from mofanerf_tpu.render.renderer import (
    encode_texture, exp_code_for, prepare_conditioning, render_frame)
from mofanerf_tpu.train.checkpoint import restore_checkpoint
from mofanerf_tpu.train.state import create_train_state

DATA = "studydata/faces16x20"
cfg = Config(expname="morphable16x20r5", basedir="studydata/logs",
             datadir=DATA, uvdir=os.path.join(DATA, "uv"),
             shape_codes_path=os.path.join(DATA, "factors_id.npy"),
             person_num=16, white_bkgd=True)
spec = cfg.model_spec()
state = create_train_state(jax.random.PRNGKey(0), spec)
state = restore_checkpoint(os.path.join(cfg.basedir, cfg.expname, "checkpoints"), state)
params = state.params
print("step", int(state.step))

persons = [0, 1]
codes = load_shape_codes(cfg.shape_codes_path)
ds = load_facescape_data(cfg.datadir, list(range(16)), codes, uvdir=cfg.uvdir, testskip=1)
H, W, focal = ds.hwf
K = jnp.asarray([[focal, 0, .5 * W], [0, focal, .5 * H], [0, 0, 1.]])
face_params = np.load(os.path.join(cfg.datadir, "face_params.npy"))
bank = sorted(set(int(e) for e in ds.exp_types))
test_idx = {}
for i in ds.i_split[2]:
    test_idx.setdefault(int(ds.id_codes[i]), []).append(int(i))

render = jax.jit(lambda c, pose: render_frame(params, spec, c, H, W, K, pose)["rgb"])

def psnr(a, b):
    return float(-10 * np.log10(max(float(np.mean((np.asarray(a) - np.asarray(b)) ** 2)), 1e-12)))

out = {"step": int(state.step), "bank": bank, "ids": persons, "per_id": {}}
for pid in persons:
    uv = read_image(ds.uv_paths[pid], is_uvmap=True, uv_size=spec.uv_size)
    tex = encode_texture(params, spec, jnp.asarray(uv))
    poses = [jnp.asarray(ds.poses[test_idx[pid][k]][:3]) for k in (0, 5)]
    # M[c, g] = mean over poses of PSNR(render code c, GT exp g)
    M = np.zeros((len(bank), len(bank)))
    for pi, pose in enumerate(poses):
        gts = []
        for g in bank:
            v, f, alb = face_mesh(face_params[pid], g)
            gt, _, mask = rasterize_mesh(v, f, np.asarray(K),
                                         np.asarray(ds.poses[test_idx[pid][(0, 5)[pi]]]),
                                         H, W, face_albedo=alb)
            gt = gt * mask[..., None] + (1.0 - mask[..., None])
            gts.append(gt)
        for ci, c in enumerate(bank):
            cond = prepare_conditioning(params, spec, jnp.asarray(codes[pid]),
                                        exp_code_for(params, c), tex)
            r = np.asarray(render(cond, pose))
            for gi in range(len(bank)):
                M[ci, gi] += psnr(r, gts[gi]) / len(poses)
    diag = np.diag(M)
    row_margin = diag - (M - np.eye(len(bank)) * 1e9).max(1)  # diag vs best wrong-GT
    col_margin = diag - (M - np.eye(len(bank)) * 1e9).max(0)  # diag vs best wrong-code
    print(f"id {pid}: diag mean {diag.mean():.2f} dB")
    for i, e in enumerate(bank):
        print(f"  exp {e}: diag {diag[i]:.2f} rowM {row_margin[i]:+.2f} colM {col_margin[i]:+.2f}")
    print(f"  rows positive: {(row_margin > 0).sum()}/{len(bank)}  cols positive: {(col_margin > 0).sum()}/{len(bank)}")
    out["per_id"][pid] = {"matrix": M.round(3).tolist(),
                          "row_margin": row_margin.round(3).tolist(),
                          "col_margin": col_margin.round(3).tolist()}
json.dump(out, open("/tmp/diag_expmatrix.json", "w"), indent=1)
print("wrote /tmp/diag_expmatrix.json")
