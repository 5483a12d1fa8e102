"""Fitting CLI — counterpart of the reference's
`python run_fit.py --filePath <img> --renderType fitting|rendering|
rendering_modulation --num_iterations 2000` (run_fit.py:437-448).

Expects the preprocessing pipeline's outputs next to the photo:
`pose_<name>.npy` holding {pose 4x4, kp 68x2} (tools/wildData_preprocess.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.config import load_config
from mofanerf_tpu.train.checkpoint import restore_checkpoint, latest_step
from mofanerf_tpu.train.fit import FitConfig, load_code_stats
from mofanerf_tpu.train.fit_loop import (
    fit,
    load_fit_codes,
    render_novel_views,
    render_modulation,
)
from mofanerf_tpu.train.state import create_train_state
from mofanerf_tpu.data.facescape import read_image


def load_pose_file(src_path: str):
    """pose_<name>.npy next to the photo's parent dir (run_fit.py:102-113)."""
    parent = os.path.dirname(os.path.dirname(os.path.abspath(src_path)))
    name = os.path.splitext(os.path.basename(src_path))[0]
    path = os.path.join(parent, f"pose_{name}.npy")
    d = np.load(path, allow_pickle=True).item()
    return np.asarray(d["pose"], np.float32), np.asarray(d["kp"], np.float32)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--filePath", required=True, help="preprocessed photo (segRelRes/*.png)")
    parser.add_argument("--renderType", default="fitting",
                        choices=["fitting", "rendering", "rendering_modulation"])
    parser.add_argument("--num_iterations", type=int, default=2000)
    parser.add_argument("--pose_freeze_iters", type=int, default=300,
                        help="codes-only warmup before the pose unfreezes; "
                             "co-optimizing from step 0 lets codes absorb "
                             "the init pose error and drift the rotation "
                             "(round-3 measurement: 5.9->19.9 deg)")
    parser.add_argument("--ckpt_dir", default=None, help="trained model checkpoint dir")
    parser.add_argument("--code_stats", default=None, help="texShpDistribution.npy path")
    parser.add_argument("--predef_par", default=None, help="preset codes .npy for modulation")
    parser.add_argument("--is_load_par", action="store_true")
    args, rest = parser.parse_known_args(argv)
    cfg = load_config(rest)

    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded model checkpoint from {ckpt_dir} (step {int(state.step)})")
    else:
        print(f"WARNING: no checkpoint in {ckpt_dir}; fitting against an untrained model")
    params = state.params

    target = read_image(args.filePath)
    pose, kp2d = load_pose_file(args.filePath)
    fcfg = FitConfig(n_iters=args.num_iterations, n_rand=cfg.N_rand,
                     pose_freeze_iters=args.pose_freeze_iters)

    name = os.path.splitext(os.path.basename(args.filePath))[0]
    type_name = os.path.basename(os.path.dirname(args.filePath))
    parent = os.path.dirname(os.path.dirname(os.path.abspath(args.filePath)))
    out_dir = os.path.join(parent, "fitting", f"{type_name}_{name}")

    shape_stats = tex_stats = None
    if args.code_stats and os.path.exists(args.code_stats):
        shape_stats, tex_stats = load_code_stats(args.code_stats)

    if args.renderType == "fitting":
        exp_init = jnp.asarray(params["exp_codes"][0])  # neutral (run_fit.py:205)
        fit(
            params, spec, target, pose, kp2d, out_dir, fcfg,
            resume=args.is_load_par, exp_init=exp_init,
            shape_stats=shape_stats, tex_stats=tex_stats,
        )
    else:
        codes, step = load_fit_codes(os.path.join(out_dir, "fit_params.npz"))
        print(f"loaded fitted codes at iter {step}")
        if args.renderType == "rendering":
            render_novel_views(params, spec, codes, out_dir, fcfg)
        else:
            presets = None
            if args.predef_par and os.path.exists(args.predef_par):
                presets = np.load(args.predef_par, allow_pickle=True).item()
            render_modulation(
                params, spec, codes, out_dir,
                exp_bank=jnp.asarray(params["exp_codes"]), presets=presets, cfg=fcfg,
            )


if __name__ == "__main__":
    main()
