from mofanerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    apply_field,
    fold_conditioning,
    apply_field_folded,
    field_param_count,
)
from mofanerf_tpu.models.ism import init_ism_params, apply_ism
from mofanerf_tpu.models.student import (
    StudentConfig,
    init_student_params,
    apply_student,
    fold_student_code,
    point_apply,
    init_point_field,
)
from mofanerf_tpu.models.tex_encoder import TextureEncoder

__all__ = [
    "FieldConfig",
    "init_field_params",
    "apply_field",
    "fold_conditioning",
    "apply_field_folded",
    "field_param_count",
    "init_ism_params",
    "apply_ism",
    "TextureEncoder",
    "StudentConfig",
    "init_student_params",
    "apply_student",
    "fold_student_code",
    "point_apply",
    "init_point_field",
]
