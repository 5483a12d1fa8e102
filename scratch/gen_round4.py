"""Round-4 dataset generation (host CPU; run only while the TPU is idle).

Three datasets, all with the SAME identity seed (11) so the 16 identities
are shared:
  faces16    16 ids x 4 exps  @128^2, 40 views/exp  — the chain4 scale-up
             (exps 0/1/2/18 are bit-identical to the legacy 3-axis model,
             so this is exactly the staged round-3 dataset)
  faces16x20 16 ids x 20 exps @128^2, 20 views/exp  — full expression-bank
             fine-tune corpus (VERDICT r3 #7)
  faces16hi  16 ids x 4 exps  @256^2, 20 views/exp  — sharp ground truth
             for the RefineNet corpus (VERDICT r3 #1): poses depend only on
             (seed, view_stride), not resolution, so renders from the
             128^2-trained model pair pixel-aligned with genuinely
             higher-detail GT.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

t0 = time.time()
params = make_face_dataset(
    "/root/repo/studydata/faces16",
    n_ids=16, exp_ids=(0, 1, 2, 18), res=128, seed=11,
    n_workers=1, view_stride=3, n_holdout=10,
)
print(f"faces16 done ({time.time() - t0:.0f}s), params {params.shape}", flush=True)

t0 = time.time()
make_face_dataset(
    "/root/repo/studydata/faces16x20",
    n_ids=16, exp_ids=tuple(range(20)), res=128, seed=11,
    n_workers=1, view_stride=6, n_holdout=6,
)
print(f"faces16x20 done ({time.time() - t0:.0f}s)", flush=True)

t0 = time.time()
make_face_dataset(
    "/root/repo/studydata/faces16hi",
    n_ids=16, exp_ids=(0, 1, 2, 18), res=256, seed=11,
    n_workers=1, view_stride=6, n_holdout=6,
)
print(f"faces16hi done ({time.time() - t0:.0f}s)", flush=True)
print("GEN_ROUND4 COMPLETE")
