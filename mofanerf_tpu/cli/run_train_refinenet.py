"""RefineNet training CLI — counterpart of run_train_refineNet.py.

Trains the pix2pixHD refiner on paired (NeRF render, ground truth) images
produced by `render_refine_trainset`. The reference's stray sys.exit()
after one iteration (run_train_refineNet.py:106) is, naturally, not
reproduced.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.data.refine_dataset import RefinePairDataset
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from mofanerf_tpu.train.refine import (
    RefineConfig,
    init_refine_state,
    make_refine_optimizers,
    refine_train_step,
)
from mofanerf_tpu.utils.visualizer import Visualizer


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--nerf_folder", default="train")
    p.add_argument("--gt_folder", default="gt")
    p.add_argument("--name", default="refine")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--loadSize", type=int, default=512)
    p.add_argument("--batchSize", type=int, default=1)
    p.add_argument("--niter", type=int, default=19)
    p.add_argument("--niter_decay", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--no_vgg_loss", action="store_true")
    p.add_argument("--vgg_weights", default=None,
                   help="pickled pytree of converted VGG19 params "
                        "(convert_torchvision_vgg19 output, pickle.dump'd)")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--save_epoch_freq", type=int, default=1)
    p.add_argument("--display_freq", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=None, help="debug cap")
    args = p.parse_args(argv)

    out_dir = os.path.join(args.checkpoints_dir, args.name)
    os.makedirs(out_dir, exist_ok=True)
    viz = Visualizer(out_dir, args.name)

    ds = RefinePairDataset(
        os.path.join(args.dataroot, args.nerf_folder),
        os.path.join(args.dataroot, args.gt_folder),
        load_size=args.loadSize,
    )
    assert len(ds) > 0, "empty dataset"
    print(f"#training pairs = {len(ds)}")

    cfg = RefineConfig(
        ngf=args.ngf, lr=args.lr, niter=args.niter, niter_decay=args.niter_decay,
        use_vgg=not args.no_vgg_loss, load_size=args.loadSize,
    )
    steps_per_epoch = max(1, len(ds) // args.batchSize)
    state = init_refine_state(
        jax.random.PRNGKey(0), cfg, steps_per_epoch, image_size=args.loadSize
    )
    g_tx, d_tx = make_refine_optimizers(cfg, steps_per_epoch)

    vgg_params = None
    if cfg.use_vgg and args.vgg_weights and os.path.exists(args.vgg_weights):
        import pickle

        with open(args.vgg_weights, "rb") as f:
            vgg_params = pickle.load(f)
    elif cfg.use_vgg:
        print("WARNING: no --vgg_weights given; dropping the VGG perceptual term")
        cfg = RefineConfig(**{**cfg.__dict__, "use_vgg": False})

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if args.continue_train and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"resumed at step {int(state.step)}")

    step_fn = jax.jit(
        lambda s, a, b: refine_train_step(s, a, b, cfg, g_tx, d_tx, vgg_params)
    )

    rng = np.random.default_rng(0)
    total_epochs = args.niter + args.niter_decay
    start_epoch = int(state.step) // steps_per_epoch
    done = False
    for epoch in range(start_epoch, total_epochs):
        t0 = time.time()
        order = rng.permutation(len(ds))
        for i in range(0, steps_per_epoch * args.batchSize, args.batchSize):
            idxs = order[i:i + args.batchSize]
            if len(idxs) < args.batchSize:
                break
            flip = bool(rng.integers(2))
            pairs = [ds.get(int(j), flip) for j in idxs]
            a = jnp.asarray(np.stack([p[0] for p in pairs]))
            b = jnp.asarray(np.stack([p[1] for p in pairs]))
            state, metrics = step_fn(state, a, b)
            if int(state.step) % args.display_freq == 0:
                viz.print_errors(
                    epoch, int(state.step),
                    {k: float(v) for k, v in metrics.items()}, time.time() - t0,
                )
            if args.max_steps and int(state.step) >= args.max_steps:
                done = True
                break
        if epoch % args.save_epoch_freq == 0 or epoch == total_epochs - 1 or done:
            save_checkpoint(ckpt_dir, state, int(state.step))
            print(f"saved checkpoint at epoch {epoch} (step {int(state.step)})")
        if done:
            break


if __name__ == "__main__":
    main()
