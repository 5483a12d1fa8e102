"""RefineNet training-corpus renderer — counterpart of
render_refine_trainSet.py:25-318.

For each identity x `exp_num` random expressions x `view_num` random views,
renders a frame with the trained coarse model into
  <out>/<id>/<exp>/<view>.png
Views are drawn from the DATASET's own frames and rendered at those poses
(the reference renders at dataset poses too, render_refine_trainSet.py:286)
so each render has a pixel-aligned ground-truth image; the mapping is
written to <out>/gt_manifest.json for `prepare_refine_trainset`.
Resumable (skips ids whose output dir already exists —
render_refine_trainSet.py:250-262) and manually shardable across machines
with --begin_person/--end_person (README.md:125).

TPU notes: the per-(id, exp) conditioning fold happens once, then all
views render as packeted frames inside jit; frames for one identity run
back-to-back with no recompiles (static HxW). --fast uses occupancy
culling (~4x for the 24k-frame reference corpus).
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
from mofanerf_tpu.utils.metrics import to8b


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--begin_person", type=int, default=0)
    p.add_argument("--end_person", type=int, default=None)
    p.add_argument("--exp_num", type=int, default=10)
    p.add_argument("--view_num", type=int, default=8)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fast", action="store_true",
                   help="occupancy-culled rendering: build a density grid per "
                        "(identity, expression) and evaluate the fine net on the "
                        "top-32 occupied samples only (~4x per corpus at 8 views)")
    args, rest = p.parse_known_args(argv)
    cfg = load_config(rest)

    import imageio.v2 as imageio

    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded model checkpoint (step {int(state.step)})")
    else:
        print(f"WARNING: no checkpoint in {ckpt_dir}; rendering untrained model")
    params = state.params

    persons = valid_persons(cfg.datadir, cfg.person_num)
    persons = persons[args.begin_person: args.end_person]
    shape_codes = load_shape_codes(cfg.shape_codes_path)
    ds = load_facescape_data(
        cfg.datadir, persons, shape_codes, uvdir=cfg.uvdir, testskip=0
    )
    H0, W0, focal0 = ds.hwf
    scale = args.res / H0
    H = W = args.res
    K = jnp.asarray(
        [[focal0 * scale, 0, 0.5 * W], [0, focal0 * scale, 0.5 * H], [0, 0, 1]]
    )
    rng = np.random.default_rng(args.seed)

    if args.fast:
        from mofanerf_tpu.ops.occupancy import build_proposal_grid, render_frame_fast

        def make_render(cond):
            # probe the COARSE field: the fine net is unconstrained off the
            # importance-sample distribution (see build_proposal_grid)
            grid = build_proposal_grid(params, spec, cond)
            return lambda c2w: render_frame_fast(
                params, spec, cond.fine, grid, H, W, K, c2w
            )["rgb"]
    else:
        render_jit = jax.jit(
            lambda cond, c2w: render_frame(params, spec, cond, H, W, K, c2w)["rgb"]
        )

        def make_render(cond):
            return lambda c2w: render_jit(cond, c2w)

    manifest_path = os.path.join(args.out_dir, "gt_manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))

    # frame indices of the train split grouped by (pid, exp)
    train_set = set(int(i) for i in ds.i_split[0])
    by_id_exp = {}
    for i in train_set:
        by_id_exp.setdefault(
            (int(ds.id_codes[i]), int(ds.exp_types[i])), []
        ).append(i)

    for pid in persons:
        pid_dir = os.path.join(args.out_dir, str(pid))
        if os.path.exists(pid_dir):
            print(f"skip existing {pid_dir}")
            continue
        uv_path = ds.uv_paths.get(int(pid), "")
        if not os.path.exists(uv_path):
            print(f"skip {pid}: no UV map at {uv_path}")
            continue
        uv = read_image(uv_path, is_uvmap=True, uv_size=spec.uv_size)
        tex = encode_texture(params, spec, jnp.asarray(uv))
        exps = sorted({e for (p_, e) in by_id_exp if p_ == int(pid)})
        exps = list(rng.choice(exps, size=min(args.exp_num, len(exps)), replace=False))
        for exp in exps:
            frames = by_id_exp[(int(pid), int(exp))]
            picks = rng.choice(frames, size=min(args.view_num, len(frames)),
                               replace=False)
            exp_dir = os.path.join(pid_dir, str(int(exp)))
            os.makedirs(exp_dir, exist_ok=True)
            cond = prepare_conditioning(
                params, spec, jnp.asarray(shape_codes[int(pid)]),
                exp_code_for(params, int(exp)), tex,
            )
            render = make_render(cond)
            for v, fi in enumerate(picks):
                fi = int(fi)
                c2w = jnp.asarray(ds.poses[fi][:3])
                rgb = np.asarray(render(c2w))
                rel = os.path.join(str(pid), str(int(exp)), f"{v:02d}.png")
                imageio.imwrite(os.path.join(args.out_dir, rel), to8b(rgb))
                manifest[rel] = ds.image_paths[fi]
        json.dump(manifest, open(manifest_path, "w"))
        print(f"rendered id {pid}")
    json.dump(manifest, open(manifest_path, "w"))


if __name__ == "__main__":
    main()
