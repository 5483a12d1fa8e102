"""Checkpoint-converter parity tests.

Builds a synthetic torch state dict in the reference's exact key layout,
computes the reference forward with torch functional ops (independent
oracle), converts, and checks the JAX apply reproduces it.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mofanerf_tpu.models.field import FieldConfig, apply_field  # noqa: E402
from mofanerf_tpu.models.ism import apply_ism  # noqa: E402
from mofanerf_tpu.convert import (  # noqa: E402
    convert_field,
    convert_ism,
    convert_tex_encoder,
    convert_exp_codes,
)
from mofanerf_tpu.models.tex_encoder import TextureEncoder  # noqa: E402
from mofanerf_tpu.ops.embed import fourier_embed  # noqa: E402

CFG = FieldConfig(depth=8, width=64, skip=4)


def _lin(key, out_f, in_f, g):
    return {
        f"{key}.weight": torch.randn(out_f, in_f, generator=g) * 0.2,
        f"{key}.bias": torch.randn(out_f, generator=g) * 0.1,
    }


def make_field_sd(cfg: FieldConfig, g):
    W, D, skip = cfg.width, cfg.depth, cfg.skip
    pe, ve = cfg.pts_embed_dim, cfg.views_embed_dim
    sd = {}
    sd.update(_lin("xyzEncode.linears1.Linear0", W, pe + cfg.exp_dim, g))
    for i in range(cfg.xyz_depth):
        sd.update(_lin(f"xyzEncode.linears1.Linear{i + 1}", W, W, g))
    for name, code in [("linear_BiM_xyz", cfg.shape_dim), ("linear_uv_xyzBiM", cfg.tex_dim)]:
        sd.update(_lin(f"{name}.linears1.Linear0", W, code + W, g))
        for i in range(skip):
            sd.update(_lin(f"{name}.linears1.Linear{i + 1}", W, W, g))
        sd.update(_lin(f"{name}.linears2.Linear0", W, (code + W) + W, g))
        for i in range(D - skip - 2):
            sd.update(_lin(f"{name}.linears2.Linear{i + 1}", W, W, g))
    sd.update(_lin("alpha_linear.0", 1, W, g))
    sd.update(_lin("linear_view_xyBMuv.0", W // 2, ve + W, g))
    sd.update(_lin("rgb_linear", 3, W // 2, g))
    return sd


def torch_skipmlp(sd, prefix, x, n1, n2):
    h = x
    for i in range(n1):
        h = F.relu(F.linear(h, sd[f"{prefix}.linears1.Linear{i}.weight"],
                            sd[f"{prefix}.linears1.Linear{i}.bias"]))
    if n2 > 0:
        h = torch.cat([x, h], dim=1)
        for i in range(n2):
            h = F.relu(F.linear(h, sd[f"{prefix}.linears2.Linear{i}.weight"],
                                sd[f"{prefix}.linears2.Linear{i}.bias"]))
    return h


def torch_field_forward(sd, cfg, pts_embed, exp, shape, tex, dirs_embed):
    """Reference NeRF.forward oracle (models/model.py:121-137) in torch."""
    B = pts_embed.shape[0]
    x = torch.cat([pts_embed, exp.expand(B, -1)], dim=1)
    xyz_code = torch_skipmlp(sd, "xyzEncode", x, 1 + cfg.xyz_depth, 0)
    sig_in = torch.cat([shape.expand(B, -1), xyz_code], dim=1)
    sigma_feat = torch_skipmlp(sd, "linear_BiM_xyz", sig_in, 1 + cfg.skip,
                               1 + cfg.depth - cfg.skip - 2)
    alpha = F.linear(sigma_feat, sd["alpha_linear.0.weight"], sd["alpha_linear.0.bias"])
    rgb_in = torch.cat([tex.expand(B, -1), sigma_feat], dim=1)
    rgb_feat = torch_skipmlp(sd, "linear_uv_xyzBiM", rgb_in, 1 + cfg.skip,
                             1 + cfg.depth - cfg.skip - 2)
    v = torch.cat([dirs_embed, rgb_feat], dim=1)
    v = F.relu(F.linear(v, sd["linear_view_xyBMuv.0.weight"], sd["linear_view_xyBMuv.0.bias"]))
    rgb = F.linear(v, sd["rgb_linear.weight"], sd["rgb_linear.bias"])
    return rgb, alpha


def test_field_conversion_parity():
    g = torch.Generator().manual_seed(0)
    sd = make_field_sd(CFG, g)
    params = convert_field(sd, CFG)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((11, 3)).astype(np.float32)
    dirs = rng.standard_normal((11, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    shape = rng.standard_normal(50).astype(np.float32) * 0.3
    exp = rng.standard_normal(30).astype(np.float32) * 0.3
    tex = rng.standard_normal(256).astype(np.float32) * 0.3

    rgb_j, sig_j = apply_field(
        params, jnp.asarray(pts), jnp.asarray(dirs),
        jnp.asarray(shape), jnp.asarray(exp), jnp.asarray(tex), CFG,
    )

    pe = np.asarray(fourier_embed(jnp.asarray(pts), CFG.multires))
    de = np.asarray(fourier_embed(jnp.asarray(dirs), CFG.multires_views))
    rgb_t, sig_t = torch_field_forward(
        sd, CFG, torch.from_numpy(pe.copy()), torch.from_numpy(exp[None].copy()),
        torch.from_numpy(shape[None]), torch.from_numpy(tex[None]),
        torch.from_numpy(de),
    )
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), rtol=1e-3, atol=1e-3)


def test_ism_conversion_parity():
    g = torch.Generator().manual_seed(1)
    sd = {}
    d_in = 50
    for i in range(4):
        sd.update(_lin(f"linears1.Linear{i}", 256, d_in, g))
        d_in = 256
    sd.update(_lin("linears_scale", 30, 256, g))
    sd.update(_lin("linears_bias", 30, 256, g))
    params = convert_ism(sd)

    x = np.random.default_rng(1).standard_normal(50).astype(np.float32) * 0.3
    s_j, b_j = apply_ism(params, jnp.asarray(x))

    h = torch.from_numpy(x[None])
    for i in range(4):
        h = F.relu(F.linear(h, sd[f"linears1.Linear{i}.weight"], sd[f"linears1.Linear{i}.bias"]))
    s_t = F.linear(h, sd["linears_scale.weight"], sd["linears_scale.bias"])
    b_t = F.linear(h, sd["linears_bias.weight"], sd["linears_bias.bias"])
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy()[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_j), b_t.numpy()[0], rtol=1e-4, atol=1e-4)


def test_tex_encoder_conversion_parity():
    g = torch.Generator().manual_seed(2)
    widths = [(3, 32), (32, 32), (32, 32), (32, 32), (32, 64), (64, 128), (128, 256)]
    sd = {}
    for n, (ci, (cin, cout)) in enumerate(zip([0, 2, 4, 6, 8, 10, 12], widths)):
        sd[f"encoder.down1.0.{ci}.weight"] = torch.randn(cout, cin, 4, 4, generator=g) * 0.1
        sd[f"encoder.down1.0.{ci}.bias"] = torch.randn(cout, generator=g) * 0.05
    sd.update(_lin("encoder.down2.0", 512, 256 * 4 * 4, g))
    sd.update(_lin("encoder.mu", 64, 512, g))
    for di in [0, 2, 4]:
        sd.update(_lin(f"encoder.decoding.{di}", 64, 64, g))
    variables = convert_tex_encoder(sd)

    x = torch.randn(1, 3, 512, 512, generator=g) * 0.5
    h = x
    for ci in [0, 2, 4, 6, 8, 10, 12]:
        h = F.leaky_relu(
            F.conv2d(h, sd[f"encoder.down1.0.{ci}.weight"], sd[f"encoder.down1.0.{ci}.bias"],
                     stride=2, padding=1),
            0.2,
        )
    h = h.reshape(1, -1)
    h = F.leaky_relu(F.linear(h, sd["encoder.down2.0.weight"], sd["encoder.down2.0.bias"]), 0.2)
    z = F.linear(h, sd["encoder.mu.weight"], sd["encoder.mu.bias"])
    for di in [0, 2, 4]:
        z = F.leaky_relu(
            F.linear(z, sd[f"encoder.decoding.{di}.weight"], sd[f"encoder.decoding.{di}.bias"]),
            0.1,
        )
    want = z.numpy()[0]

    enc = TextureEncoder(tex_dim=64)
    uv = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    got = np.asarray(enc.apply(variables, uv))[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_exp_codes_conversion():
    latents = [torch.full((1, 30), float(i)) for i in range(20)]
    bank = convert_exp_codes(latents)
    assert bank.shape == (21, 30)
    np.testing.assert_allclose(bank[5], 5.0)
    np.testing.assert_allclose(bank[20], 0.0)  # fitting slot empty
