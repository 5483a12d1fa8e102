"""Torch-oracle converter tests for the preprocess networks.

The pretrained weights (Seg_79999_iter.pth, trained_model_03.t7) are
LFS-missing upstream, so parity is proven the same way test_convert.py
does for the field: build a RANDOM state dict in the reference's exact key
layout (including BatchNorm running stats), run an independent torch
functional reimplementation of the reference forward
(SegmentCode/model.py:231-263 + resnet.py:58-90;
models/defineHourglass_512_gray_skip.py:20-195), convert, and assert the
Flax forward reproduces it. A transposed conv kernel, a mis-folded BN, a
wrong interpolate convention, or a misrouted skip branch all fail here.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mofanerf_tpu.preprocess.relight import (  # noqa: E402
    HourglassNet,
    convert_hourglass_weights,
)
from mofanerf_tpu.preprocess.segment import (  # noqa: E402
    BiSeNet,
    convert_bisenet_weights,
)


def _conv(sd, key, cout, cin, k, g):
    sd[f"{key}.weight"] = torch.randn(cout, cin, k, k, generator=g) * (
        0.4 / np.sqrt(cin * k * k)
    )


def _bn(sd, key, c, g):
    sd[f"{key}.weight"] = 1.0 + torch.randn(c, generator=g) * 0.1
    sd[f"{key}.bias"] = torch.randn(c, generator=g) * 0.1
    sd[f"{key}.running_mean"] = torch.randn(c, generator=g) * 0.1
    sd[f"{key}.running_var"] = 0.5 + torch.rand(c, generator=g)


def t_bn(sd, p, x):
    return F.batch_norm(
        x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
        sd[f"{p}.weight"], sd[f"{p}.bias"], training=False,
    )


# ---------------------------------------------------------------------------
# BiSeNet
# ---------------------------------------------------------------------------

def _convbnrelu_sd(sd, key, cout, cin, k, g):
    _conv(sd, f"{key}.conv", cout, cin, k, g)
    _bn(sd, f"{key}.bn", cout, g)


def make_bisenet_sd(g, n_classes=19):
    sd = {}
    _conv(sd, "cp.resnet.conv1", 64, 3, 7, g)
    _bn(sd, "cp.resnet.bn1", 64, g)
    chans = {"layer1": (64, 64), "layer2": (64, 128),
             "layer3": (128, 256), "layer4": (256, 512)}
    for layer, (cin, cout) in chans.items():
        for i in (0, 1):
            p = f"cp.resnet.{layer}.{i}"
            ci = cin if i == 0 else cout
            _conv(sd, f"{p}.conv1", cout, ci, 3, g)
            _bn(sd, f"{p}.bn1", cout, g)
            _conv(sd, f"{p}.conv2", cout, cout, 3, g)
            _bn(sd, f"{p}.bn2", cout, g)
            if i == 0 and cin != cout:
                _conv(sd, f"{p}.downsample.0", cout, cin, 1, g)
                _bn(sd, f"{p}.downsample.1", cout, g)
    for arm, cin in (("arm16", 256), ("arm32", 512)):
        _convbnrelu_sd(sd, f"cp.{arm}.conv", 128, cin, 3, g)
        _conv(sd, f"cp.{arm}.conv_atten", 128, 128, 1, g)
        _bn(sd, f"cp.{arm}.bn_atten", 128, g)
    _convbnrelu_sd(sd, "cp.conv_head32", 128, 128, 3, g)
    _convbnrelu_sd(sd, "cp.conv_head16", 128, 128, 3, g)
    _convbnrelu_sd(sd, "cp.conv_avg", 128, 512, 1, g)
    _convbnrelu_sd(sd, "ffm.convblk", 256, 256, 1, g)
    _conv(sd, "ffm.conv1", 64, 256, 1, g)
    _conv(sd, "ffm.conv2", 256, 64, 1, g)
    _convbnrelu_sd(sd, "conv_out.conv", 256, 256, 3, g)
    _conv(sd, "conv_out.conv_out", n_classes, 256, 1, g)
    return sd


def t_convbnrelu(sd, p, x, stride=1, pad=1):
    return F.relu(t_bn(sd, f"{p}.bn", F.conv2d(x, sd[f"{p}.conv.weight"],
                                               None, stride, pad)))


def t_resnet_basic(sd, p, x, stride=1):
    r = F.relu(t_bn(sd, f"{p}.bn1",
                    F.conv2d(x, sd[f"{p}.conv1.weight"], None, stride, 1)))
    r = t_bn(sd, f"{p}.bn2", F.conv2d(r, sd[f"{p}.conv2.weight"], None, 1, 1))
    if f"{p}.downsample.0.weight" in sd:
        x = t_bn(sd, f"{p}.downsample.1",
                 F.conv2d(x, sd[f"{p}.downsample.0.weight"], None, stride, 0))
    return F.relu(x + r)


def t_arm(sd, p, x):
    feat = t_convbnrelu(sd, f"{p}.conv", x)
    atten = F.avg_pool2d(feat, feat.size()[2:])
    atten = torch.sigmoid(t_bn(sd, f"{p}.bn_atten",
                               F.conv2d(atten, sd[f"{p}.conv_atten.weight"])))
    return feat * atten


def torch_bisenet_forward(sd, x):
    """Reference BiSeNet.forward, main output only (model.py:243-253)."""
    h = F.relu(t_bn(sd, "cp.resnet.bn1",
                    F.conv2d(x, sd["cp.resnet.conv1.weight"], None, 2, 3)))
    h = F.max_pool2d(h, 3, 2, 1)
    for i in (0, 1):
        h = t_resnet_basic(sd, f"cp.resnet.layer1.{i}", h)
    h = t_resnet_basic(sd, "cp.resnet.layer2.0", h, stride=2)
    feat8 = t_resnet_basic(sd, "cp.resnet.layer2.1", h)
    h = t_resnet_basic(sd, "cp.resnet.layer3.0", feat8, stride=2)
    feat16 = t_resnet_basic(sd, "cp.resnet.layer3.1", h)
    h = t_resnet_basic(sd, "cp.resnet.layer4.0", feat16, stride=2)
    feat32 = t_resnet_basic(sd, "cp.resnet.layer4.1", h)

    h16, h8 = feat16.size()[2:], feat8.size()[2:]
    avg = F.avg_pool2d(feat32, feat32.size()[2:])
    avg = t_convbnrelu(sd, "cp.conv_avg", avg, pad=0)
    avg_up = F.interpolate(avg, feat32.size()[2:], mode="nearest")
    f32 = t_arm(sd, "cp.arm32", feat32) + avg_up
    f32_up = t_convbnrelu(sd, "cp.conv_head32",
                          F.interpolate(f32, h16, mode="nearest"))
    f16 = t_arm(sd, "cp.arm16", feat16) + f32_up
    f16_up = t_convbnrelu(sd, "cp.conv_head16",
                          F.interpolate(f16, h8, mode="nearest"))

    fcat = torch.cat([feat8, f16_up], dim=1)
    feat = t_convbnrelu(sd, "ffm.convblk", fcat, pad=0)
    atten = F.avg_pool2d(feat, feat.size()[2:])
    atten = F.relu(F.conv2d(atten, sd["ffm.conv1.weight"]))
    atten = torch.sigmoid(F.conv2d(atten, sd["ffm.conv2.weight"]))
    feat = feat * atten + feat

    out = t_convbnrelu(sd, "conv_out.conv", feat)
    out = F.conv2d(out, sd["conv_out.conv_out.weight"])
    return F.interpolate(out, x.size()[2:], mode="bilinear", align_corners=True)


def test_bisenet_conversion_parity():
    g = torch.Generator().manual_seed(11)
    sd = make_bisenet_sd(g)
    x = torch.randn(1, 3, 64, 64, generator=g)
    want = torch_bisenet_forward(sd, x).numpy()

    variables = convert_bisenet_weights(sd)
    got = np.asarray(
        BiSeNet().apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Hourglass (DPR relighting)
# ---------------------------------------------------------------------------

HG_PATH = {3: "HG3", 2: "HG3.middle", 1: "HG3.middle.middle",
           0: "HG3.middle.middle.middle"}
NC_PRE = 16
NCS = [16, 32, 64, 8 * 16 + 27]


def make_hourglass_sd(g):
    sd = {}
    sd["pre_conv.weight"] = torch.randn(NC_PRE, 1, 5, 5, generator=g) * 0.1
    sd["pre_conv.bias"] = torch.randn(NC_PRE, generator=g) * 0.1
    _bn(sd, "pre_bn", NC_PRE, g)

    def basic(prefix, cin, cout, bn):
        _conv(sd, f"{prefix}.conv1", cout, cin, 3, g)
        _conv(sd, f"{prefix}.conv2", cout, cout, 3, g)
        # the reference registers `shortcuts` unconditionally
        _conv(sd, f"{prefix}.shortcuts", cout, cin, 1, g)
        if bn:
            _bn(sd, f"{prefix}.bn1", cout, g)
            _bn(sd, f"{prefix}.bn2", cout, g)

    for level in (3, 2, 1, 0):
        p = HG_PATH[level]
        idx = 3 - level
        cin = NC_PRE if level == 3 else NCS[idx - 1]
        mid = NCS[idx]
        basic(f"{p}.upper", cin, cin, bn=False)
        basic(f"{p}.low1", cin, mid, bn=True)
        basic(f"{p}.low2", mid, cin, bn=False)

    lp = HG_PATH[0] + ".middle"
    _conv(sd, f"{lp}.predict_FC1", 128, 27, 1, g)
    sd[f"{lp}.predict_relu1.weight"] = torch.tensor([0.2])
    _conv(sd, f"{lp}.predict_FC2", 9, 128, 1, g)
    _conv(sd, f"{lp}.post_FC1", 128, 9, 1, g)
    sd[f"{lp}.post_relu1.weight"] = torch.tensor([0.3])
    _conv(sd, f"{lp}.post_FC2", 27, 128, 1, g)

    for i in (1, 2, 3):
        k = 3 if i == 1 else 1
        _conv(sd, f"conv_{i}", NC_PRE, NC_PRE, k, g)
        sd[f"conv_{i}.bias"] = torch.randn(NC_PRE, generator=g) * 0.1
        _bn(sd, f"bn_{i}", NC_PRE, g)
    sd["output.weight"] = torch.randn(1, NC_PRE, 1, 1, generator=g) * 0.1
    sd["output.bias"] = torch.randn(1, generator=g) * 0.1
    return sd


def t_basic_hg(sd, p, x, bn):
    cout = sd[f"{p}.conv1.weight"].shape[0]
    cin = sd[f"{p}.conv1.weight"].shape[1]
    out = F.conv2d(x, sd[f"{p}.conv1.weight"], None, 1, 1)
    out = t_bn(sd, f"{p}.bn1", out) if bn else F.instance_norm(out)
    out = F.relu(out)
    out = F.conv2d(out, sd[f"{p}.conv2.weight"], None, 1, 1)
    out = t_bn(sd, f"{p}.bn2", out) if bn else F.instance_norm(out)
    if cin != cout:
        out = out + F.conv2d(x, sd[f"{p}.shortcuts.weight"])
    else:
        out = out + x
    return F.relu(out)


def t_lighting(sd, lp, inner, target_light):
    x = inner[:, :27]
    feat = x.mean(dim=(2, 3), keepdim=True)
    light = F.prelu(F.conv2d(feat, sd[f"{lp}.predict_FC1.weight"]),
                    sd[f"{lp}.predict_relu1.weight"])
    light = F.conv2d(light, sd[f"{lp}.predict_FC2.weight"])
    up = F.prelu(F.conv2d(target_light, sd[f"{lp}.post_FC1.weight"]),
                 sd[f"{lp}.post_relu1.weight"])
    up = F.relu(F.conv2d(up, sd[f"{lp}.post_FC2.weight"]))
    up = up.repeat((1, 1, x.shape[2], x.shape[3]))
    return torch.cat([up, inner[:, 27:]], dim=1), light


def t_hourglass(sd, level, x, target_light, count, skip_count):
    p = HG_PATH[level]
    upper = t_basic_hg(sd, f"{p}.upper", x, bn=False)
    low = F.max_pool2d(x, 2, 2)
    low = t_basic_hg(sd, f"{p}.low1", low, bn=True)
    if level == 0:
        low, light = t_lighting(sd, f"{p}.middle", low, target_light)
    else:
        low, light = t_hourglass(sd, level - 1, low, target_light,
                                 count + 1, skip_count)
    low = t_basic_hg(sd, f"{p}.low2", low, bn=False)
    low = F.interpolate(low, scale_factor=2, mode="nearest")
    return (low + upper if count >= skip_count else low), light


def torch_hourglass_forward(sd, x, target_light, skip_count=0):
    feat = F.conv2d(x, sd["pre_conv.weight"], sd["pre_conv.bias"], 1, 2)
    feat = F.relu(t_bn(sd, "pre_bn", feat))
    feat, light = t_hourglass(sd, 3, feat, target_light, 0, skip_count)
    for i in (1, 2, 3):
        pad = 1 if i == 1 else 0
        feat = F.relu(t_bn(sd, f"bn_{i}",
                           F.conv2d(feat, sd[f"conv_{i}.weight"],
                                    sd[f"conv_{i}.bias"], 1, pad)))
    out = F.conv2d(feat, sd["output.weight"], sd["output.bias"])
    return torch.sigmoid(out), light


def test_hourglass_conversion_parity():
    g = torch.Generator().manual_seed(13)
    sd = make_hourglass_sd(g)
    x = torch.rand(1, 1, 64, 64, generator=g)
    tl = torch.randn(1, 9, 1, 1, generator=g) * 0.3
    want_img, want_light = torch_hourglass_forward(sd, x, tl)

    variables = convert_hourglass_weights(sd)
    got_img, got_light = HourglassNet().apply(
        variables,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(tl.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got_img).transpose(0, 3, 1, 2), want_img.numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got_light).reshape(-1), want_light.numpy().reshape(-1),
        rtol=2e-3, atol=2e-3,
    )
