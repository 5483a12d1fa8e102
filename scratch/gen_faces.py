"""Generate the morphable-flagship study dataset (host-side, CPU)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

params = make_face_dataset(
    "/root/repo/studydata/faces8",
    n_ids=8, exp_ids=(0, 1, 2), res=128, seed=7,
    n_workers=1, view_stride=2, n_holdout=12,
)
print("params:", params.shape)
