from mofanerf_tpu.data.facescape import (
    FacescapeDataset,
    load_facescape_data,
    read_image,
    load_shape_codes,
    make_synthetic_dataset,
    EXPRESSION_NAMES,
)
from mofanerf_tpu.data.landmarks import TrainRaySampler, FitRaySampler

__all__ = [
    "FacescapeDataset",
    "load_facescape_data",
    "read_image",
    "load_shape_codes",
    "make_synthetic_dataset",
    "EXPRESSION_NAMES",
    "TrainRaySampler",
    "FitRaySampler",
]
