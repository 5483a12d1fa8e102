"""Portrait relighting: DPR-style Hourglass network in Flax.

Capability parity with tools/fit_data_pre/models/defineHourglass_512_gray_skip.py
(:20-195) + RelightingModule.py:22-55: 4 nested hourglass blocks whose
innermost `lightingNet` (a) predicts the source lighting as 9 SH
coefficients from the mean of the 27 lighting channels and (b) REPLACES
those channels with features derived from a target SH — relighting the
image to the canonical FaceScape studio light. Runs on the L channel of
LAB at 512x512.

Inference-only: BatchNorms folded at conversion; the InstanceNorms of the
skip branches are computed at runtime (they are parameter-free in the
reference). `trained_model_03.t7` is a torch-serialized checkpoint —
convert with `convert_hourglass_weights` when loadable; with random
weights the module is architecture-complete and shape-tested.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

NC_LIGHT = 27
NC_OUT_LIGHT = 9


def _instance_norm(x, eps=1e-5):
    m = x.mean(axis=(1, 2), keepdims=True)
    v = x.var(axis=(1, 2), keepdims=True)
    return (x - m) / jnp.sqrt(v + eps)


class BasicBlock(nn.Module):
    """conv-norm-relu-conv-norm + 1x1 shortcut when channels change.

    norm_type: 'bn' (folded affine) or 'in' (runtime instance norm)."""

    features: int
    norm_type: str = "bn"

    def _norm(self, x, idx):
        if self.norm_type == "in":
            return _instance_norm(x)
        scale = self.param(f"bn{idx}_scale", nn.initializers.ones, (self.features,))
        shift = self.param(f"bn{idx}_shift", nn.initializers.zeros, (self.features,))
        return x * scale + shift

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(self._norm(out, 1))
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = self._norm(out, 2)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False, name="shortcut")(x)
        return nn.relu(out + x)


class LightingNet(nn.Module):
    """Innermost block: predict source SH from the lighting channels and
    substitute target-SH features back (defineHourglass...:100-139)."""

    nc_middle: int = 128

    @nn.compact
    def __call__(self, inner_feat, target_light):
        x = inner_feat[..., :NC_LIGHT]
        feat = x.mean(axis=(1, 2), keepdims=True)  # [B,1,1,27]
        h = nn.Conv(self.nc_middle, (1, 1), use_bias=False, name="predict_FC1")(feat)
        a1 = self.param("predict_prelu", nn.initializers.constant(0.25), (1,))
        h = jnp.where(h >= 0, h, a1 * h)
        light = nn.Conv(NC_OUT_LIGHT, (1, 1), use_bias=False, name="predict_FC2")(h)

        up = nn.Conv(self.nc_middle, (1, 1), use_bias=False, name="post_FC1")(target_light)
        a2 = self.param("post_prelu", nn.initializers.constant(0.25), (1,))
        up = jnp.where(up >= 0, up, a2 * up)
        up = nn.relu(nn.Conv(NC_LIGHT, (1, 1), use_bias=False, name="post_FC2")(up))
        up = jnp.broadcast_to(up, x.shape)
        out = jnp.concatenate([up, inner_feat[..., NC_LIGHT:]], axis=-1)
        return out, light


class HourglassNet(nn.Module):
    """4-level hourglass; returns (relit L channel [B,H,W,1] in [0,1],
    predicted source SH [B,1,1,9])."""

    base: int = 16

    @nn.compact
    def __call__(self, x, target_light, skip_count: int = 0):
        nc_pre = self.base
        ncs = [self.base, 2 * self.base, 4 * self.base, 8 * self.base + NC_LIGHT]

        feat = nn.Conv(nc_pre, (5, 5), padding=((2, 2), (2, 2)), name="pre_conv")(x)
        s = self.param("pre_bn_scale", nn.initializers.ones, (nc_pre,))
        b = self.param("pre_bn_shift", nn.initializers.zeros, (nc_pre,))
        feat = nn.relu(feat * s + b)

        light_net = LightingNet(name="light")

        def hourglass(h, level, count):
            """level 3..0 outer->inner. Channels: HG3 (in=nc_pre,
            mid=ncs[0]), HG2 (in=ncs[0], mid=ncs[1]), HG1 (in=ncs[1],
            mid=ncs[2]), HG0 (in=ncs[2], mid=ncs[3])."""
            idx = 3 - level
            inp = nc_pre if level == 3 else ncs[idx - 1]
            mid = ncs[idx]
            upper = BasicBlock(inp, norm_type="in", name=f"HG{level}_upper")(h)
            low = nn.max_pool(h, (2, 2), strides=(2, 2))
            low = BasicBlock(mid, norm_type="bn", name=f"HG{level}_low1")(low)
            if level == 0:
                low, light = light_net(low, target_light)
            else:
                low, light = hourglass(low, level - 1, count + 1)
            low = BasicBlock(inp, norm_type="in", name=f"HG{level}_low2")(low)
            low = jax.image.resize(
                low, (low.shape[0], low.shape[1] * 2, low.shape[2] * 2, low.shape[3]),
                method="nearest",
            )
            # skip_count is static: levels shallower than it drop the skip
            # branch (defineHourglass...:88-95)
            out = low + upper if count >= skip_count else low
            return out, light

        feat, out_light = hourglass(feat, 3, 0)
        for i in (1, 2, 3):
            k = (3, 3) if i == 1 else (1, 1)
            pad = ((1, 1), (1, 1)) if i == 1 else "VALID"
            feat = nn.Conv(nc_pre, k, padding=pad, name=f"conv_{i}")(feat)
            s = self.param(f"bn_{i}_scale", nn.initializers.ones, (nc_pre,))
            b = self.param(f"bn_{i}_shift", nn.initializers.zeros, (nc_pre,))
            feat = nn.relu(feat * s + b)
        out = nn.Conv(1, (1, 1), name="output")(feat)
        return jax.nn.sigmoid(out), out_light


def relight_to_canonical(
    img_rgb: np.ndarray,
    variables,
    target_sh: np.ndarray,
    size: int = 512,
):
    """Relight an RGB [0,1] image to the canonical studio SH
    (RelightingModule.trans_get_sh behavior): run the net on the LAB L
    channel, merge the relit L back. Returns (relit rgb, source SH [9])."""
    import cv2

    h0, w0 = img_rgb.shape[:2]
    img = cv2.resize(img_rgb, (size, size)) if (h0, w0) != (size, size) else img_rgb
    lab = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2LAB)
    L = lab[..., 0].astype(np.float32) / 255.0

    tl = jnp.asarray(np.asarray(target_sh, np.float32).reshape(1, 1, 1, 9))
    out_l, src_light = HourglassNet().apply(variables, jnp.asarray(L[None, ..., None]), tl)
    relit_l = np.asarray(out_l)[0, ..., 0]

    lab[..., 0] = np.clip(relit_l * 255, 0, 255).astype(np.uint8)
    relit = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.float32) / 255.0
    if (h0, w0) != (size, size):
        relit = cv2.resize(relit, (w0, h0))
    return relit, np.asarray(src_light).reshape(9)


from mofanerf_tpu.preprocess.bn_fold import fold_bn as _fold_bn  # noqa: E402


def convert_hourglass_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference trained_model_03.t7 state dict -> HourglassNet variables."""
    sd = state_dict

    def k(name):
        return np.asarray(sd[name]).transpose(2, 3, 1, 0)

    def _shortcut_needed(prefix):
        # the reference instantiates `shortcuts` unconditionally but only
        # APPLIES it when inplanes != outplanes
        # (defineHourglass_512_gray_skip.py:37,64-67) — convert it only
        # when the block actually changes channel count, or flax rejects
        # the unused parameter
        w1 = np.asarray(sd[f"{prefix}.conv1.weight"])  # [out, in, 3, 3]
        return w1.shape[0] != w1.shape[1] and f"{prefix}.shortcuts.weight" in sd

    def basic_bn(prefix, features):
        out = {
            "conv1": {"kernel": k(f"{prefix}.conv1.weight")},
            "conv2": {"kernel": k(f"{prefix}.conv2.weight")},
        }
        s1, b1 = _fold_bn(sd, f"{prefix}.bn1")
        s2, b2 = _fold_bn(sd, f"{prefix}.bn2")
        out["bn1_scale"], out["bn1_shift"] = s1, b1
        out["bn2_scale"], out["bn2_shift"] = s2, b2
        if _shortcut_needed(prefix):
            out["shortcut"] = {"kernel": k(f"{prefix}.shortcuts.weight")}
        return out

    def basic_in(prefix):
        out = {
            "conv1": {"kernel": k(f"{prefix}.conv1.weight")},
            "conv2": {"kernel": k(f"{prefix}.conv2.weight")},
        }
        if _shortcut_needed(prefix):
            out["shortcut"] = {"kernel": k(f"{prefix}.shortcuts.weight")}
        return out

    p: Dict[str, Any] = {
        "pre_conv": {"kernel": k("pre_conv.weight"),
                     "bias": np.asarray(sd["pre_conv.bias"])},
    }
    s, b = _fold_bn(sd, "pre_bn")
    p["pre_bn_scale"], p["pre_bn_shift"] = s, b

    # nested module paths: HG3.upper, HG3.low1, HG3.middle == HG2 ...
    path = {3: "HG3", 2: "HG3.middle", 1: "HG3.middle.middle", 0: "HG3.middle.middle.middle"}
    for level in (3, 2, 1, 0):
        pref = path[level]
        p[f"HG{level}_upper"] = basic_in(f"{pref}.upper")
        p[f"HG{level}_low1"] = basic_bn(f"{pref}.low1", None)
        p[f"HG{level}_low2"] = basic_in(f"{pref}.low2")

    lp = f"{path[0]}.middle"
    p["light"] = {
        "predict_FC1": {"kernel": k(f"{lp}.predict_FC1.weight")},
        "predict_FC2": {"kernel": k(f"{lp}.predict_FC2.weight")},
        "post_FC1": {"kernel": k(f"{lp}.post_FC1.weight")},
        "post_FC2": {"kernel": k(f"{lp}.post_FC2.weight")},
    }
    p["light"]["predict_prelu"] = np.asarray(sd[f"{lp}.predict_relu1.weight"]).reshape(1)
    p["light"]["post_prelu"] = np.asarray(sd[f"{lp}.post_relu1.weight"]).reshape(1)

    for i in (1, 2, 3):
        p[f"conv_{i}"] = {"kernel": k(f"conv_{i}.weight"),
                          "bias": np.asarray(sd[f"conv_{i}.bias"])}
        s, b = _fold_bn(sd, f"bn_{i}")
        p[f"bn_{i}_scale"], p[f"bn_{i}_shift"] = s, b
    p["output"] = {"kernel": k("output.weight"), "bias": np.asarray(sd["output.bias"])}
    return {"params": p}
