"""Quality evaluation CLI: render a dataset's test split and report
PSNR/SSIM vs ground truth.

The quality-parity harness for FaceScape test views (BASELINE.md's
"PSNR within 0.2 dB" target): point it at a converted reference checkpoint
and the FaceScape multiview dataset to reproduce/compare the paper's
quality numbers. (LPIPS needs pretrained perceptual weights — unavailable
in this environment — and is intentionally omitted.)
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.config import load_config
from mofanerf_tpu.data.facescape import (
    load_facescape_data,
    load_shape_codes,
    read_image,
    valid_persons,
)
from mofanerf_tpu.render.renderer import (
    prepare_conditioning,
    render_frame,
    encode_texture,
    exp_code_for,
)
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
from mofanerf_tpu.train.state import create_train_state
from mofanerf_tpu.utils.metrics import ssim, to8b


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--out_dir", default=None, help="also save renders here")
    p.add_argument("--max_views", type=int, default=25)
    p.add_argument("--render_factor", type=int, default=1)
    p.add_argument("--fast", action="store_true", help="occupancy-culled rendering")
    args, rest = p.parse_known_args(argv)
    cfg = load_config(rest)

    import imageio.v2 as imageio

    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    assert latest_step(ckpt_dir) is not None, f"no checkpoint in {ckpt_dir}"
    state = restore_checkpoint(ckpt_dir, state)
    params = state.params
    print(f"evaluating checkpoint step {int(state.step)}")

    persons = valid_persons(cfg.datadir, cfg.person_num)
    shape_codes = load_shape_codes(cfg.shape_codes_path)
    ds = load_facescape_data(
        cfg.datadir, persons, shape_codes, uvdir=cfg.uvdir,
        half_res=cfg.half_res, testskip=cfg.testskip,
    )
    H, W, focal = ds.hwf
    rf = max(1, args.render_factor)
    H, W, focal = H // rf, W // rf, focal / rf
    K = jnp.asarray([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])

    uv_cache, grid_cache = {}, {}
    psnrs, ssims = [], []
    test_ids = ds.i_split[2][: args.max_views]
    for n, ti in enumerate(test_ids):
        ti = int(ti)
        pid = int(ds.id_codes[ti])
        if pid not in uv_cache:
            uv_cache[pid] = jnp.asarray(
                read_image(ds.uv_paths[pid], is_uvmap=True, uv_size=spec.uv_size)
            ) if ds.uv_paths else jnp.full((spec.uv_size, spec.uv_size, 3), 0.5)
        tex = encode_texture(params, spec, uv_cache[pid])
        cond = prepare_conditioning(
            params, spec, jnp.asarray(ds.shape_codes[ti]),
            exp_code_for(params, int(ds.exp_types[ti])), tex,
        )
        if args.fast:
            from mofanerf_tpu.ops.occupancy import build_proposal_grid, render_frame_fast

            key = (pid, int(ds.exp_types[ti]))
            if key not in grid_cache:
                grid_cache[key] = build_proposal_grid(params, spec, cond)
            out = render_frame_fast(
                params, spec, cond.fine, grid_cache[key], H, W, K,
                jnp.asarray(ds.poses[ti][:3]),
            )
        else:
            out = render_frame(params, spec, cond, H, W, K, jnp.asarray(ds.poses[ti][:3]))
        rgb = np.asarray(out["rgb"])
        gt = read_image(ds.image_paths[ti], half_res=cfg.half_res,
                        white_bkgd=cfg.white_bkgd)
        if rf > 1:
            import cv2

            gt = cv2.resize(gt, (W, H), interpolation=cv2.INTER_AREA)
        mse = float(np.mean((rgb - gt) ** 2))
        psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        ssims.append(ssim(rgb, gt))
        print(f"[{n + 1}/{len(test_ids)}] view {ti}: psnr {psnrs[-1]:.2f} ssim {ssims[-1]:.4f}")
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            imageio.imwrite(os.path.join(args.out_dir, f"{ti:05d}.png"), to8b(rgb))

    result = {
        "n_views": len(psnrs),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "ssim_mean": round(float(np.mean(ssims)), 4),
        "psnr_std": round(float(np.std(psnrs)), 3),
    }
    print(json.dumps(result))
    if args.out_dir:
        with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
