"""Generate the 16-identity x 4-expression morphable study dataset
(host-side CPU; run only while the TPU is idle — one host core)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

params = make_face_dataset(
    "/root/repo/studydata/faces16",
    n_ids=16, exp_ids=(0, 1, 2, 18), res=128, seed=11,
    n_workers=1, view_stride=3, n_holdout=10,
)
print("params:", params.shape)
