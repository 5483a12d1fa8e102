"""Export per-identity occupancy grids for production serving.

After training, builds one density grid per (identity, expression) from the
fine field and saves them as a compressed npz. Serving loads the grid and
renders through `ops/occupancy.py::render_frame_fast` at ~4x the
reference-budget rate (see bench.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.config import load_config
from mofanerf_tpu.data.facescape import load_shape_codes, read_image, valid_persons
from mofanerf_tpu.ops.occupancy import build_proposal_grid
from mofanerf_tpu.render.renderer import (
    prepare_conditioning,
    encode_texture,
    exp_code_for,
)
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
from mofanerf_tpu.train.state import create_train_state


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--threshold", type=float, default=1.0)
    p.add_argument("--expressions", default="0", help="comma-separated exp ids")
    p.add_argument("--max_persons", type=int, default=None)
    args, rest = p.parse_known_args(argv)
    cfg = load_config(rest)

    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    assert latest_step(ckpt_dir) is not None, f"no checkpoint in {ckpt_dir}"
    state = restore_checkpoint(ckpt_dir, state)
    params = state.params

    persons = valid_persons(cfg.datadir, cfg.person_num) if os.path.isdir(cfg.datadir) \
        else list(range(cfg.person_num))
    if args.max_persons:
        persons = persons[: args.max_persons]
    shape_codes = load_shape_codes(cfg.shape_codes_path)
    exps = [int(e) for e in args.expressions.split(",")]

    grids = {}
    aabb = None
    for pid in persons:
        uv_path = os.path.join(cfg.uvdir, str(pid), "1_neutral.jpg")
        if os.path.exists(uv_path):
            tex = encode_texture(
                params, spec,
                jnp.asarray(read_image(uv_path, is_uvmap=True, uv_size=spec.uv_size)),
            )
        else:
            tex = jnp.zeros(spec.tex_dim)
        for exp in exps:
            cond = prepare_conditioning(
                params, spec, jnp.asarray(shape_codes[int(pid)]),
                exp_code_for(params, exp), tex,
            )
            grid = build_proposal_grid(
                params, spec, cond,
                resolution=args.resolution, density_threshold=args.threshold,
            )
            grids[f"occ_{pid}_{exp}"] = np.packbits(np.asarray(grid.occ))
            aabb = (np.asarray(grid.aabb_min), np.asarray(grid.aabb_max))
            occ_frac = float(jnp.mean(grid.occ))
            print(f"id {pid} exp {exp}: occupancy {occ_frac:.3f}")

    if not grids:
        raise SystemExit(
            "nothing to export: no (identity, expression) pairs produced a grid "
            "(check --max_persons / --expressions / datadir)"
        )
    np.savez_compressed(
        args.out,
        resolution=args.resolution,
        aabb_min=aabb[0], aabb_max=aabb[1],
        **grids,
    )
    print(f"exported {len(grids)} grids -> {args.out}")


def load_exported_grid(path: str, pid: int, exp: int):
    """Load one grid back as an OccupancyGrid."""
    from mofanerf_tpu.ops.occupancy import OccupancyGrid

    d = np.load(path)
    G = int(d["resolution"])
    bits = np.unpackbits(d[f"occ_{pid}_{exp}"])[: G ** 3]
    return OccupancyGrid(
        jnp.asarray(bits.reshape(G, G, G).astype(bool)),
        jnp.asarray(d["aabb_min"]),
        jnp.asarray(d["aabb_max"]),
    )


if __name__ == "__main__":
    main()
