from mofanerf_tpu.models.refine.generator import GlobalGenerator, LocalEnhancer
from mofanerf_tpu.models.refine.discriminator import MultiscaleDiscriminator
from mofanerf_tpu.models.refine.losses import (
    lsgan_loss,
    feature_matching_loss,
    VGG19Features,
    vgg_perceptual_loss,
)

__all__ = [
    "GlobalGenerator",
    "LocalEnhancer",
    "MultiscaleDiscriminator",
    "lsgan_loss",
    "feature_matching_loss",
    "VGG19Features",
    "vgg_perceptual_loss",
]
