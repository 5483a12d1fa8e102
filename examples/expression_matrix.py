"""Full expression-transfer matrix study: render every expression CODE and
score against every expression's rasterized GROUND TRUTH at shared poses.

This is the decisive expression-identifiability measurement (VERDICT r4
#5): the scalar own-vs-wrong probe in morphable_flagship.py compares each
expression only against the bank's first entry over 6 views, so its margin
is bounded by model error and noisy at +-0.5 dB. Here, for each identity
and pose we build M[c, g] = PSNR(render with code c, GT of expression g)
over the full bank and report per-expression margins:

- row margin  (code c): M[c, c] - max_{g != c} M[c, g] — does rendering
  with code c look MORE like expression c's face than any other's?
- col margin  (gt g):   M[g, g] - max_{c != g} M[c, g] — is code g the
  BEST code for expression g's face?

A code-blind model scores ~0 on both; a model that truly renders distinct
expressions is positive on rows. Reference anchor: one latent per
expression, models/render_class.py:53-58,75-81.

Writes artifacts/expression_matrix.json (+ returns nonzero rows/cols
counts in the summary).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="studydata/faces16x20")
    p.add_argument("--basedir", default="studydata/logs")
    p.add_argument("--expname", default="morphable16x20r5")
    p.add_argument("--n_ids", type=int, default=16)
    p.add_argument("--ids", type=int, default=2, help="identities to measure")
    p.add_argument("--poses", type=int, default=2, help="held-out poses per id")
    p.add_argument("--out_json", default="artifacts/expression_matrix.json")
    p.add_argument("--near", type=float, default=8.0)
    p.add_argument("--far", type=float, default=26.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mofanerf_tpu.config import Config
    from mofanerf_tpu.data.facescape import (
        load_facescape_data, load_shape_codes, read_image)
    from mofanerf_tpu.datagen.rasterize import rasterize_mesh
    from mofanerf_tpu.datagen.synthetic_faces import face_mesh
    from mofanerf_tpu.render.renderer import (
        encode_texture, exp_code_for, prepare_conditioning, render_frame)
    from mofanerf_tpu.train.checkpoint import restore_checkpoint
    from mofanerf_tpu.train.state import create_train_state

    cfg = Config(expname=args.expname, basedir=args.basedir,
                 datadir=args.data, uvdir=os.path.join(args.data, "uv"),
                 shape_codes_path=os.path.join(args.data, "factors_id.npy"),
                 person_num=args.n_ids, white_bkgd=True,
                 near=args.near, far=args.far)
    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    state = restore_checkpoint(
        os.path.join(cfg.basedir, cfg.expname, "checkpoints"), state)
    params = state.params
    print("eval at step", int(state.step))

    codes = load_shape_codes(cfg.shape_codes_path)
    ds = load_facescape_data(cfg.datadir, list(range(args.n_ids)), codes,
                             uvdir=cfg.uvdir, testskip=1)
    H, W, focal = ds.hwf
    K = jnp.asarray([[focal, 0, .5 * W], [0, focal, .5 * H], [0, 0, 1.]])
    face_params = np.load(os.path.join(cfg.datadir, "face_params.npy"))
    bank = sorted(set(int(e) for e in ds.exp_types))
    test_idx = {}
    for i in ds.i_split[2]:
        test_idx.setdefault(int(ds.id_codes[i]), []).append(int(i))

    render = jax.jit(lambda c, pose: render_frame(
        params, spec, c, H, W, K, pose)["rgb"])

    def psnr(a, b):
        return float(-10 * np.log10(max(
            float(np.mean((np.asarray(a) - np.asarray(b)) ** 2)), 1e-12)))

    B = len(bank)
    out = {"study": "expression-transfer matrix: every code vs every "
                    "expression's rasterized GT at shared held-out poses",
           "step": int(state.step), "bank": bank, "per_id": {}}
    all_row, all_col = [], []
    for pid in range(args.ids):
        uv = read_image(ds.uv_paths[pid], is_uvmap=True, uv_size=spec.uv_size)
        tex = encode_texture(params, spec, jnp.asarray(uv))
        pose_picks = test_idx[pid][:: max(1, len(test_idx[pid]) // args.poses)][
            : args.poses]
        M = np.zeros((B, B))
        for i0 in pose_picks:
            pose = jnp.asarray(ds.poses[i0][:3])
            gts = []
            for g in bank:
                v, f, alb = face_mesh(face_params[pid], g)
                gt, _, mask = rasterize_mesh(v, f, np.asarray(K),
                                             np.asarray(ds.poses[i0]), H, W,
                                             face_albedo=alb)
                gts.append(gt * mask[..., None] + (1.0 - mask[..., None]))
            for ci, c in enumerate(bank):
                cond = prepare_conditioning(
                    params, spec, jnp.asarray(codes[pid]),
                    exp_code_for(params, c), tex)
                r = np.asarray(render(cond, pose))
                for gi in range(B):
                    M[ci, gi] += psnr(r, gts[gi]) / len(pose_picks)
        diag = np.diag(M)
        off = M - np.eye(B) * 1e9
        row_m = diag - off.max(1)
        col_m = diag - off.max(0)
        all_row.append(row_m)
        all_col.append(col_m)
        print(f"id {pid}: diag mean {diag.mean():.2f} dB, "
              f"rows+ {(row_m > 0).sum()}/{B}, cols+ {(col_m > 0).sum()}/{B}")
        out["per_id"][pid] = {
            "matrix_psnr_db": np.round(M, 3).tolist(),
            "diag_mean_db": round(float(diag.mean()), 3),
            "row_margin_db": np.round(row_m, 3).tolist(),
            "col_margin_db": np.round(col_m, 3).tolist(),
        }
    row_mean = np.mean(all_row, axis=0)
    col_mean = np.mean(all_col, axis=0)
    out["summary"] = {
        "rows_positive_mean_over_ids": int((row_mean > 0).sum()),
        "cols_positive_mean_over_ids": int((col_mean > 0).sum()),
        "bank_size": B,
        "mean_row_margin_db": round(float(row_mean.mean()), 3),
        "mean_col_margin_db": round(float(col_mean.mean()), 3),
        "per_exp_row_margin_db": {int(bank[i]): round(float(row_mean[i]), 3)
                                  for i in range(B)},
    }
    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(out, open(args.out_json, "w"), indent=1)
    print(f"rows positive (id-mean margins): "
          f"{out['summary']['rows_positive_mean_over_ids']}/{B}, "
          f"cols: {out['summary']['cols_positive_mean_over_ids']}/{B}")
    print("wrote", args.out_json)


if __name__ == "__main__":
    main()
