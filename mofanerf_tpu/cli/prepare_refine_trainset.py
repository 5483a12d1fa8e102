"""GT pairing for the RefineNet corpus — counterpart of
prepare_refineNet_trainSet.py:1-16 (without its hard-coded paths): mirrors
the rendered `train/` tree into `gt/` by copying the matching ground-truth
multiview images.
"""
from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--renders_dir", required=True, help="trainset renders: <id>/<exp>/<view>.png")
    p.add_argument("--gt_source", required=True,
                   help="ground-truth multiview images: <id>/<exp>_<view>.png layout "
                        "(the datagen multiview output)")
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)

    n = 0
    for pid in sorted(os.listdir(args.renders_dir)):
        pdir = os.path.join(args.renders_dir, pid)
        if not os.path.isdir(pdir):
            continue
        for exp in sorted(os.listdir(pdir)):
            edir = os.path.join(pdir, exp)
            if not os.path.isdir(edir):
                continue
            out = os.path.join(args.out_dir, pid, exp)
            os.makedirs(out, exist_ok=True)
            for view in sorted(os.listdir(edir)):
                vid = os.path.splitext(view)[0]
                src = os.path.join(args.gt_source, pid, f"{exp}_{int(vid):03d}.png")
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(out, view))
                    n += 1
                else:
                    print(f"missing GT for {pid}/{exp}/{view}")
    print(f"paired {n} ground-truth images into {args.out_dir}")


if __name__ == "__main__":
    main()
