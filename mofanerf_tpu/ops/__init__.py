from mofanerf_tpu.ops.embed import fourier_embed, embed_dim
from mofanerf_tpu.ops.rays import get_rays, get_rays_at, ndc_rays, pose_spherical
from mofanerf_tpu.ops.sampling import stratified_z_vals, sample_pdf
from mofanerf_tpu.ops.composite import composite
from mofanerf_tpu.ops.uv_sample import bilinear_sample
from mofanerf_tpu.ops.bounds import ray_aabb_interval, bounded_z_vals
from mofanerf_tpu.ops.sweep import sweep_frame, HIT_BUDGET_BUCKETS

# NOTE: mofanerf_tpu.ops.occupancy is imported directly (not re-exported
# here) — it depends on models.field, which itself imports ops.embed, so an
# eager import would be circular.

__all__ = [
    "fourier_embed",
    "embed_dim",
    "get_rays",
    "get_rays_at",
    "ndc_rays",
    "pose_spherical",
    "stratified_z_vals",
    "sample_pdf",
    "composite",
    "bilinear_sample",
    "ray_aabb_interval",
    "bounded_z_vals",
    "sweep_frame",
    "HIT_BUDGET_BUCKETS",
]
