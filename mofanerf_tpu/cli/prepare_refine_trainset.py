"""GT pairing for the RefineNet corpus — counterpart of
prepare_refineNet_trainSet.py:1-16 (without its hard-coded paths): mirrors
the rendered `train/` tree into `gt/` with the matching ground-truth
images.

Uses the `gt_manifest.json` written by `render_refine_trainset` (renders
are made at dataset poses, so each has an exactly pixel-aligned GT frame);
GT images are resized to the render resolution when they differ.
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--renders_dir", required=True,
                   help="trainset renders with gt_manifest.json")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--white_bkgd", action="store_true",
                   help="composite RGBA ground truth over white (must match "
                        "the white_bkgd setting the coarse model was "
                        "trained/rendered with)")
    args = p.parse_args(argv)

    import cv2
    import imageio.v2 as imageio
    import numpy as np

    manifest_path = os.path.join(args.renders_dir, "gt_manifest.json")
    assert os.path.exists(manifest_path), (
        f"no gt_manifest.json in {args.renders_dir} — run render_refine_trainset "
        "first (it records which dataset frame each render corresponds to)"
    )
    manifest = json.load(open(manifest_path))

    n = 0
    for rel, gt_src in sorted(manifest.items()):
        render_path = os.path.join(args.renders_dir, rel)
        if not os.path.exists(render_path):
            continue
        if not os.path.exists(gt_src):
            print(f"missing GT source {gt_src}")
            continue
        render = imageio.imread(render_path)
        gt = np.asarray(imageio.imread(gt_src))
        if gt.shape[-1] == 4 and args.white_bkgd:
            a = gt[..., 3:].astype(np.float32) / 255.0
            gt = np.clip(gt[..., :3] * a + 255.0 * (1.0 - a), 0, 255
                         ).astype(gt.dtype)
        gt = gt[..., :3]
        if gt.shape[:2] != render.shape[:2]:
            gt = cv2.resize(gt, (render.shape[1], render.shape[0]),
                            interpolation=cv2.INTER_AREA)
        out_path = os.path.join(args.out_dir, rel)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        imageio.imwrite(out_path, gt)
        n += 1
    print(f"paired {n} ground-truth images into {args.out_dir}")


if __name__ == "__main__":
    main()
