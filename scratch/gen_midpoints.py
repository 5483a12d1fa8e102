"""Midpoint-identity augmentation dataset (VERDICT r3 #3: interp-dip probe).

Builds studydata/faces16m: the SAME 16 seed-11 identities PLUS 8 midpoint
identities (pairwise means of consecutive pairs). The face generator is
linear in the identity params, so row 16+k IS the true intermediate face of
ids (2k, 2k+1) — training on them supervises the code-space midpoints the
interpolation measurement probes. Run on host only while the TPU is idle.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from mofanerf_tpu.datagen.synthetic_faces import (
    make_face_dataset, sample_identity_params,
)

# reuse the already-rendered 16 base identities (render_identity skips ids
# whose transforms_train_{pid}.json exists) — only the 8 midpoints render
import glob
import os
import shutil

src, dst = "/root/repo/studydata/faces16", "/root/repo/studydata/faces16m"
os.makedirs(dst, exist_ok=True)
for pid in range(16):
    if not os.path.exists(os.path.join(dst, str(pid))):
        os.symlink(os.path.join(src, str(pid)), os.path.join(dst, str(pid)))
    for j in glob.glob(os.path.join(src, f"transforms_*_{pid}.json")):
        tgt = os.path.join(dst, os.path.basename(j))
        if not os.path.exists(tgt):
            shutil.copy(j, tgt)
    uvs, uvd = os.path.join(src, "uv", str(pid)), os.path.join(dst, "uv", str(pid))
    os.makedirs(os.path.join(dst, "uv"), exist_ok=True)
    if not os.path.exists(uvd):
        os.symlink(uvs, uvd)

base = sample_identity_params(16, seed=11)
mids = np.stack([(base[2 * k] + base[2 * k + 1]) / 2.0 for k in range(8)])
params = np.concatenate([base, mids]).astype(np.float32)

t0 = time.time()
out = make_face_dataset(
    "/root/repo/studydata/faces16m",
    exp_ids=(0, 1, 2, 18), res=128, seed=11,
    n_workers=1, view_stride=3, n_holdout=10,
    id_params=params,
)
print(f"faces16m done ({time.time() - t0:.0f}s), params {out.shape}")
print("GEN_MIDPOINTS COMPLETE")
