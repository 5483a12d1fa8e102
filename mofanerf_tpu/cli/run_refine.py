"""RefineNet inference CLI — counterpart of run_refine.py:14-64.

Walks --nerf_folder (flat dir of rendered frames), runs the generator, and
writes results into a sibling `refine/` directory.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.data.refine_dataset import RefinePairDataset
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
from mofanerf_tpu.train.refine import (
    RefineConfig,
    init_refine_state,
    refine_inference,
)
from mofanerf_tpu.utils.visualizer import Visualizer


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nerf_folder", required=True, help="flat dir of rendered frames")
    p.add_argument("--name", default="refine")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--loadSize", type=int, default=512)
    p.add_argument("--ngf", type=int, default=32)
    args = p.parse_args(argv)

    cfg = RefineConfig(ngf=args.ngf, load_size=args.loadSize)
    state = init_refine_state(jax.random.PRNGKey(0), cfg, image_size=args.loadSize)
    ckpt_dir = os.path.join(args.checkpoints_dir, args.name, "checkpoints")
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded refiner checkpoint (step {int(state.step)})")
    else:
        print(f"WARNING: no checkpoint at {ckpt_dir}; using untrained generator")

    ds = RefinePairDataset(args.nerf_folder, load_size=args.loadSize, flat=True)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(args.nerf_folder)), "refine")
    viz = Visualizer(os.path.join(args.checkpoints_dir, args.name), args.name)

    infer = jax.jit(lambda a: refine_inference(state.g_params, a, cfg))
    for i in range(len(ds)):
        a, _ = ds.get(i)
        out = np.asarray(infer(jnp.asarray(a[None])))[0]
        name = os.path.splitext(os.path.basename(ds.a_paths[i]))[0]
        path = viz.save_result_image(out_dir, name, (out + 1.0) / 2.0)
        print(f"[{i + 1}/{len(ds)}] {path}")


if __name__ == "__main__":
    main()
