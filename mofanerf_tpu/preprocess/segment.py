"""Face parsing: BiSeNet (ResNet18 backbone) in Flax, inference-only.

Capability parity with tools/fit_data_pre/SegmentCode/model.py:231-263 +
resnet.py:58-90: the reference's modified BiSeNet (spatial path replaced
by the backbone's 1/8 feature, attention refinement on 1/16 and 1/32,
feature fusion, 19 classes) plus the evaluate/recolor pipeline in
get_pair_parsing2.py:21-200 (parse map -> mask with hair/bg/clothes
removal heuristics).

Inference-only design: BatchNorms are folded into per-conv (scale, shift)
at weight-conversion time (`convert_bisenet_weights`), so the Flax module
has no running statistics. The pretrained `Seg_79999_iter.pth` is
git-LFS-missing from the reference checkout and cannot be fetched in this
environment; with random weights the module is architecture-complete and
shape-tested, and converts real weights when provided.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

N_CLASSES = 19


class ConvBN(nn.Module):
    """Conv (no bias) + folded-BN affine + optional relu."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        shift = self.param("bn_shift", nn.initializers.zeros, (self.features,))
        x = x * scale + shift
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        r = ConvBN(self.features, strides=self.strides, name="conv1")(x)
        r = ConvBN(self.features, relu=False, name="conv2")(r)
        if x.shape[-1] != self.features or self.strides != (1, 1):
            x = ConvBN(self.features, kernel=(1, 1), strides=self.strides,
                       padding="VALID", relu=False, name="downsample")(x)
        return nn.relu(x + r)


class Resnet18(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, kernel=(7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = BasicBlock(64, name=f"layer1_{i}")(x)
        x = BasicBlock(128, strides=(2, 2), name="layer2_0")(x)
        feat8 = BasicBlock(128, name="layer2_1")(x)
        x = BasicBlock(256, strides=(2, 2), name="layer3_0")(feat8)
        feat16 = BasicBlock(256, name="layer3_1")(x)
        x = BasicBlock(512, strides=(2, 2), name="layer4_0")(feat16)
        feat32 = BasicBlock(512, name="layer4_1")(x)
        return feat8, feat16, feat32


class AttentionRefinement(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBN(self.features, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_atten")(atten)
        scale = self.param("bn_atten_scale", nn.initializers.ones, (self.features,))
        shift = self.param("bn_atten_shift", nn.initializers.zeros, (self.features,))
        atten = jax.nn.sigmoid(atten * scale + shift)
        return feat * atten


def _upx2(x, target_hw):
    return jax.image.resize(x, (x.shape[0],) + tuple(target_hw) + (x.shape[-1],),
                            method="nearest")


def _interp_matrix_align_corners(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] 1-D linear interpolation matrix with torch's
    align_corners=True convention (out position i samples input at
    i*(n_in-1)/(n_out-1))."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    pos = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    f = (pos - i0).astype(np.float32)
    A[np.arange(n_out), i0] = 1.0 - f
    A[np.arange(n_out), i0 + 1] += f
    return A


def bilinear_align_corners(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[B, h, w, C] -> [B, H, W, C] bilinear with align_corners=True (the
    reference upsamples its logits this way, SegmentCode/model.py:253-255).
    Expressed as two small dense matmuls instead of gathers — separable
    interpolation rides the MXU, the TPU-native formulation."""
    h, w = x.shape[1:3]
    Ah = jnp.asarray(_interp_matrix_align_corners(H, h))
    Aw = jnp.asarray(_interp_matrix_align_corners(W, w))
    return jnp.einsum("Hh,bhwc,Ww->bHWc", Ah, x, Aw)


class ContextPath(nn.Module):
    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = Resnet18(name="resnet")(x)
        h16 = feat16.shape[1:3]
        h8 = feat8.shape[1:3]

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBN(128, kernel=(1, 1), padding="VALID", name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        f32 = AttentionRefinement(128, name="arm32")(feat32) + avg_up
        f32_up = ConvBN(128, name="conv_head32")(_upx2(f32, h16))

        f16 = AttentionRefinement(128, name="arm16")(feat16) + f32_up
        f16_up = ConvBN(128, name="conv_head16")(_upx2(f16, h8))

        return feat8, f16_up, f32_up


class FeatureFusion(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, fsp, fcp):
        feat = ConvBN(self.features, kernel=(1, 1), padding="VALID",
                      name="convblk")(jnp.concatenate([fsp, fcp], axis=-1))
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(self.features // 4, (1, 1), use_bias=False,
                                name="conv1")(atten))
        atten = jax.nn.sigmoid(nn.Conv(self.features, (1, 1), use_bias=False,
                                       name="conv2")(atten))
        return feat * atten + feat


class Output(nn.Module):
    mid: int
    n_classes: int = N_CLASSES

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.mid, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = N_CLASSES

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] normalized -> [B, H, W, n_classes] logits."""
        H, W = x.shape[1:3]
        feat8, fcp8, fcp16 = ContextPath(name="cp")(x)
        fuse = FeatureFusion(256, name="ffm")(feat8, fcp8)
        out = Output(256, self.n_classes, name="conv_out")(fuse)
        # align_corners=True like the reference (model.py:253) — boundary
        # pixels of the parse map differ under the half-pixel convention
        return bilinear_align_corners(out, H, W)


# ImageNet normalization used by the reference's evaluate()
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def segment_face(img: np.ndarray, variables) -> np.ndarray:
    """img: [H, W, 3] float [0,1] -> parse map [H, W] int (19 classes)."""
    x = (img.astype(np.float32) - _MEAN) / _STD
    logits = BiSeNet().apply(variables, jnp.asarray(x[None]))
    return np.asarray(jnp.argmax(logits[0], axis=-1))


# Parse-map classes to KEEP for the face region (the reference zeroes
# background/clothes/necklace and rows >= 450 —
# tools/wildData_preprocess.py:98-117). Class ids follow face-parsing.PyTorch:
# 0=bg, 14=neck, 16=clothes, 18=hat; hair (17) is kept by the reference.
_DROP_CLASSES = (0, 14, 16, 18)


def face_mask_from_parsing(parse: np.ndarray, row_cut: int = 450) -> np.ndarray:
    """[H, W] parse map -> binary face mask with the reference's removal
    heuristics."""
    mask = ~np.isin(parse, _DROP_CLASSES)
    mask[row_cut:, :] = False
    return mask.astype(np.uint8)


from mofanerf_tpu.preprocess.bn_fold import fold_bn as _fold_bn  # noqa: E402


def _convbn(sd, conv_key, bn_key):
    w = np.asarray(sd[f"{conv_key}.weight"]).transpose(2, 3, 1, 0)
    scale, shift = _fold_bn(sd, bn_key)
    return {"conv": {"kernel": w}, "bn_scale": scale, "bn_shift": shift}


def convert_bisenet_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Seg_79999_iter.pth state dict -> BiSeNet flax variables
    (BatchNorms folded)."""
    sd = {k: v for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def basic(prefix):
        out = {
            "conv1": _convbn(sd, f"{prefix}.conv1", f"{prefix}.bn1"),
            "conv2": _convbn(sd, f"{prefix}.conv2", f"{prefix}.bn2"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            out["downsample"] = _convbn(sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1")
        return out

    resnet = {"stem": _convbn(sd, "cp.resnet.conv1", "cp.resnet.bn1")}
    for layer, blocks in [("layer1", 2), ("layer2", 2), ("layer3", 2), ("layer4", 2)]:
        for i in range(blocks):
            resnet[f"{layer}_{i}"] = basic(f"cp.resnet.{layer}.{i}")

    def arm(prefix, ch):
        g, bsh = _fold_bn(sd, f"{prefix}.bn_atten")
        return {
            "conv": _convbn(sd, f"{prefix}.conv.conv", f"{prefix}.conv.bn"),
            "conv_atten": {"kernel": np.asarray(sd[f"{prefix}.conv_atten.weight"]).transpose(2, 3, 1, 0)},
            "bn_atten_scale": g, "bn_atten_shift": bsh,
        }

    cp = {
        "resnet": resnet,
        "arm16": arm("cp.arm16", 128),
        "arm32": arm("cp.arm32", 128),
        "conv_head32": _convbn(sd, "cp.conv_head32.conv", "cp.conv_head32.bn"),
        "conv_head16": _convbn(sd, "cp.conv_head16.conv", "cp.conv_head16.bn"),
        "conv_avg": _convbn(sd, "cp.conv_avg.conv", "cp.conv_avg.bn"),
    }
    ffm = {
        "convblk": _convbn(sd, "ffm.convblk.conv", "ffm.convblk.bn"),
        "conv1": {"kernel": np.asarray(sd["ffm.conv1.weight"]).transpose(2, 3, 1, 0)},
        "conv2": {"kernel": np.asarray(sd["ffm.conv2.weight"]).transpose(2, 3, 1, 0)},
    }
    conv_out = {
        "conv": _convbn(sd, "conv_out.conv.conv", "conv_out.conv.bn"),
        "conv_out": {"kernel": np.asarray(sd["conv_out.conv_out.weight"]).transpose(2, 3, 1, 0)},
    }
    p = {"cp": cp, "ffm": ffm, "conv_out": conv_out}
    return {"params": p}
