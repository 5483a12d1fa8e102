from mofanerf_tpu.ops.embed import fourier_embed, embed_dim
from mofanerf_tpu.ops.rays import get_rays, ndc_rays, pose_spherical
from mofanerf_tpu.ops.sampling import stratified_z_vals, sample_pdf
from mofanerf_tpu.ops.composite import composite

__all__ = [
    "fourier_embed",
    "embed_dim",
    "get_rays",
    "ndc_rays",
    "pose_spherical",
    "stratified_z_vals",
    "sample_pdf",
    "composite",
]
