"""Unified checkpointing via Orbax.

Replaces the reference's three independent schemes (torch .tar with
filename-encoded step run_train.py:369-380, fitting saving_Parameters.tar
run_fit.py:320-331, refineNet per-net .pth) with ONE train-state pytree
checkpoint. The step lives inside the state, not the filename — the
reference parses the resume iteration out of the checkpoint filename
(tools/create_model_condition.py:89), a bug class this design removes.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    """Save `state` (any pytree) under ckpt_dir/<step>. Idempotent: an
    existing checkpoint at the same step is replaced (an interval save and
    the final save can legitimately land on the same step)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: int | None = None) -> Any:
    """Restore into the structure of `target` (abstract or concrete pytree).
    step=None restores the newest (the reference auto-resumes from the
    lexicographically last .tar, tools/create_model_condition.py:62-89)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)
