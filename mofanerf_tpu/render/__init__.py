from mofanerf_tpu.render.renderer import (
    RenderConfig,
    MoFaNeRF,
    init_model_params,
    prepare_conditioning,
    render_rays,
    render_frame,
)

__all__ = [
    "RenderConfig",
    "MoFaNeRF",
    "init_model_params",
    "prepare_conditioning",
    "render_rays",
    "render_frame",
]
