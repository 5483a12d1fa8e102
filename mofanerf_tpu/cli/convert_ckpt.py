"""Reference-checkpoint conversion CLI.

Converts a reference PyTorch `.tar` training checkpoint
(run_train.py:370-379 layout) into this package's orbax train-state
checkpoint so pretrained weights drive rendering/fitting directly.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tar", required=True, help="reference .tar checkpoint")
    p.add_argument("--out_dir", required=True, help="orbax checkpoint dir")
    p.add_argument("--step", type=int, default=None,
                   help="step label (default: global_step from the tar)")
    args = p.parse_args(argv)

    import torch

    from mofanerf_tpu.convert import convert_checkpoint
    from mofanerf_tpu.models.field import FieldConfig
    from mofanerf_tpu.render.renderer import MoFaNeRF
    from mofanerf_tpu.train.checkpoint import save_checkpoint
    from mofanerf_tpu.train.state import TrainState, make_optimizer

    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=256),
        fine=FieldConfig(depth=10, width=1024),
    )
    params = convert_checkpoint(args.tar, spec.coarse, spec.fine)
    ckpt = torch.load(args.tar, map_location="cpu", weights_only=False)
    step = args.step if args.step is not None else int(ckpt.get("global_step", 0))

    # fresh optimizer state: Adam moments do not transfer across frameworks
    tx = make_optimizer()
    state = TrainState(
        jax.tree_util.tree_map(jnp.asarray, params),
        tx.init(jax.tree_util.tree_map(jnp.asarray, params)),
        jnp.asarray(step, jnp.int32),
    )
    path = save_checkpoint(args.out_dir, state, step)
    print(f"converted -> {path} (step {step}; optimizer state reinitialized)")


if __name__ == "__main__":
    main()
