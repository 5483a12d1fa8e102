"""4-stage wild-photo preprocessing pipeline.

Capability parity with tools/wildData_preprocess.py:38-142: for every photo
in a directory,
  ALIGN   -> detect landmarks, similarity-warp to the canonical 512 frame,
             estimate camera pose, write raw/<name>.png + pose_<name>.npy
             ({pose 4x4, kp 68x2}) consumed by run_fit (run_fit.py:102-113)
  MASK    -> BiSeNet face parsing -> mask/<name>.png
  SEGMENT -> zero background/clothes + row cutoff -> segRes/<name>.png
  RELIGHT -> Hourglass relight to canonical SH -> segRelRes/<name>.png

Stages degrade gracefully when their model weights are unavailable (the
reference's dlib .dat and Seg_79999_iter.pth are git-LFS-missing): MASK
falls back to the landmark convex hull, RELIGHT to a pass-through copy —
each fallback is logged.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from mofanerf_tpu.preprocess.align import (
    CANONICAL_LANDMARKS_512,
    align_to_template,
    get_landmark_source,
)
from mofanerf_tpu.preprocess.matting import hull_mask, apply_mask
from mofanerf_tpu.preprocess.pose import estimate_pose_from_kp

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def preprocess_dir(
    file_path: str,
    landmarks_3d: Optional[np.ndarray] = None,   # [68, 3] template (id 1 neutral / 50)
    kp_dir: Optional[str] = None,
    dlib_predictor: Optional[str] = None,
    bisenet_variables=None,
    relight_variables=None,
    canonical_sh: Optional[np.ndarray] = None,
    stages=("align", "mask", "segment", "relight"),
    focal: float = 1200.0,
) -> None:
    import cv2
    import imageio.v2 as imageio

    out_raw = os.path.join(file_path, "raw")
    out_mask = os.path.join(file_path, "mask")
    out_seg = os.path.join(file_path, "segRes")
    out_rel = os.path.join(file_path, "segRelRes")
    for d in (out_raw, out_mask, out_seg, out_rel):
        os.makedirs(d, exist_ok=True)

    src = get_landmark_source(kp_dir or file_path, dlib_predictor)
    names = [
        f for f in sorted(os.listdir(file_path))
        if f.lower().endswith(IMG_EXTS) and os.path.isfile(os.path.join(file_path, f))
    ]

    for fname in names:
        name = os.path.splitext(fname)[0]
        img = np.asarray(imageio.imread(os.path.join(file_path, fname)), np.float32) / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img[..., :3]

        # ---- ALIGN
        kp = src.detect(img, name) if src else None
        if kp is None:
            print(f"[{name}] no landmarks available; center-crop fallback "
                  f"(provide kp_{name}.npy or a dlib predictor for quality)")
            s = min(img.shape[:2])
            y0 = (img.shape[0] - s) // 2
            x0 = (img.shape[1] - s) // 2
            aligned = cv2.resize(img[y0:y0 + s, x0:x0 + s], (512, 512))
            kp_aligned = CANONICAL_LANDMARKS_512.copy()
        else:
            aligned, kp_aligned = align_to_template(img, kp)

        if landmarks_3d is not None:
            pose, residual = estimate_pose_from_kp(kp_aligned, landmarks_3d, focal)
        else:
            # frontal default at the canonical distance (focal/scale of the
            # FaceScape rig) when no 3D template is available
            from mofanerf_tpu.ops.rays import pose_spherical

            pose, residual = pose_spherical(0.0, 0.0, 16.0), float("nan")
        if "align" in stages:
            imageio.imwrite(os.path.join(out_raw, f"{name}.png"),
                            (np.clip(aligned, 0, 1) * 255).astype(np.uint8))
            # kp stored (row, col) as run_fit's LMModule expects
            np.save(os.path.join(file_path, f"pose_{name}.npy"),
                    {"pose": pose.astype(np.float32),
                     "kp": kp_aligned[:, ::-1].astype(np.float32)})

        # ---- MASK (always computed — SEGMENT/RELIGHT depend on it)
        if True:
            if bisenet_variables is not None:
                from mofanerf_tpu.preprocess.segment import (
                    segment_face, face_mask_from_parsing,
                )

                parse = segment_face(aligned, bisenet_variables)
                mask = face_mask_from_parsing(parse)
            else:
                print(f"[{name}] BiSeNet weights unavailable; convex-hull mask fallback")
                mask = hull_mask(aligned.shape, kp_aligned)
            if "mask" in stages:
                imageio.imwrite(os.path.join(out_mask, f"{name}.png"),
                                (mask * 255).astype(np.uint8))

        # ---- SEGMENT (always computed — RELIGHT consumes it)
        seg = apply_mask(aligned, mask)
        seg[450:, :] = 0  # row cutoff (tools/wildData_preprocess.py:110-113)
        if "segment" in stages:
            imageio.imwrite(os.path.join(out_seg, f"{name}.png"),
                            (np.clip(seg, 0, 1) * 255).astype(np.uint8))

        # ---- RELIGHT
        if "relight" in stages:
            if relight_variables is not None and canonical_sh is not None:
                from mofanerf_tpu.preprocess.relight import relight_to_canonical

                relit, src_sh = relight_to_canonical(seg, relight_variables, canonical_sh)
            else:
                print(f"[{name}] relight weights unavailable; pass-through")
                relit = seg
            imageio.imwrite(os.path.join(out_rel, f"{name}.png"),
                            (np.clip(relit, 0, 1) * 255).astype(np.uint8))
        print(f"[{name}] done (pose residual {residual:.2f})")
