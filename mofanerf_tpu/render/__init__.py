from mofanerf_tpu.render.serve import render_rays_bounded, render_frame_serve
from mofanerf_tpu.render.renderer import (
    RenderConfig,
    MoFaNeRF,
    init_model_params,
    prepare_conditioning,
    render_rays,
    render_frame,
    render_frame_sharded,
    render_path,
    encode_texture,
    exp_code_for,
)

__all__ = [
    "RenderConfig",
    "MoFaNeRF",
    "init_model_params",
    "prepare_conditioning",
    "render_rays",
    "render_frame",
    "render_frame_sharded",
    "render_path",
    "encode_texture",
    "exp_code_for",
    "render_rays_bounded",
    "render_frame_serve",
]
