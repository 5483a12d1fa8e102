"""Reference-checkpoint converter: PyTorch `.tar` -> mofanerf_tpu pytree.

Reads the reference training checkpoint layout (run_train.py:370-379):
  network_fn_state_dict / network_fine_state_dict   (NeRF modules)
  network_render_textureEncoder                     (EnDeUVmap)
  network_render_idSpecific                         (StyleModule)
  expression_latent_codes_sigma                     (list of [1,30] tensors)
and maps each torch Linear/Conv onto this package's block-parameter layout
(models/field.py): concat-input matrices are split column-wise into their
per-input blocks and transposed to [in, out].

Layout facts this mapping depends on (verified against the reference):
- torch Linear weight is [out, in]; ours is [in, out].
- xyzEncode input is cat([pts_embed 63, exp' 30])   (models/render_class.py:83)
- sigma trunk input is cat([shape 50, xyz_code W])   (models/model.py:129)
- rgb trunk input is cat([tex 256, sigma_feat W])    (models/model.py:132)
- skip layers consume cat([x, h]) where x is the trunk's full input
  (models/model.py:229)
- view layer input is cat([dirs 27, rgb_feat W])     (models/model.py:133)
- the texture encoder flattens conv features in torch's NCHW order before
  its first Dense (models/tex_encoder_mod.py:85); flax flattens NHWC, so
  that Dense's input dims are permuted accordingly.

Only numpy is required here; `.tar` loading uses torch (CPU) when available.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from mofanerf_tpu.models.field import FieldConfig

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_module(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Drop DataParallel 'module.' prefixes and tensorify."""
    return {k[len("module."):] if k.startswith("module.") else k: _np(v) for k, v in sd.items()}


def _linear(sd, prefix):
    return _np(sd[f"{prefix}.weight"]), _np(sd[f"{prefix}.bias"])


def convert_field(sd: Dict[str, Any], cfg: FieldConfig) -> Params:
    """NeRF state dict -> field param pytree."""
    sd = _strip_module(sd)
    W, D, skip = cfg.width, cfg.depth, cfg.skip
    pe, ve = cfg.pts_embed_dim, cfg.views_embed_dim

    # xyzEncode: skipMLP(D=3, skip=None): linears1.Linear0..Linear3
    w0, b0 = _linear(sd, "xyzEncode.linears1.Linear0")
    xyz = {
        "w_pts": w0[:, :pe].T.copy(),
        "w_exp": w0[:, pe:].T.copy(),
        "b": b0,
        "layers": [],
    }
    for i in range(cfg.xyz_depth):
        w, b = _linear(sd, f"xyzEncode.linears1.Linear{i + 1}")
        xyz["layers"].append({"w": w.T.copy(), "b": b})

    def trunk(name: str, code_dim: int) -> Params:
        w0, b0 = _linear(sd, f"{name}.linears1.Linear0")
        t = {
            "w_code0": w0[:, :code_dim].T.copy(),
            "w_feat0": w0[:, code_dim:].T.copy(),
            "b0": b0,
            "mid": [],
            "post": [],
        }
        for i in range(skip):
            w, b = _linear(sd, f"{name}.linears1.Linear{i + 1}")
            t["mid"].append({"w": w.T.copy(), "b": b})
        ws, bs = _linear(sd, f"{name}.linears2.Linear0")
        # skip input = cat([x, h]) = [code, feat, h]
        t["w_skip_code"] = ws[:, :code_dim].T.copy()
        t["w_skip_feat"] = ws[:, code_dim:code_dim + W].T.copy()
        t["w_skip_h"] = ws[:, code_dim + W:].T.copy()
        t["b_skip"] = bs
        for i in range(D - skip - 2):
            w, b = _linear(sd, f"{name}.linears2.Linear{i + 1}")
            t["post"].append({"w": w.T.copy(), "b": b})
        return t

    sigma = trunk("linear_BiM_xyz", cfg.shape_dim)
    wa, ba = _linear(sd, "alpha_linear.0")
    sigma["alpha"] = {"w": wa.T.copy(), "b": ba}

    rgb = trunk("linear_uv_xyzBiM", cfg.tex_dim)

    wv, bv = _linear(sd, "linear_view_xyBMuv.0")
    wr, br = _linear(sd, "rgb_linear")
    view = {
        "w_dirs": wv[:, :ve].T.copy(),
        "w_feat": wv[:, ve:].T.copy(),
        "b": bv,
        "rgb": {"w": wr.T.copy(), "b": br},
    }
    return {"xyz": xyz, "sigma": sigma, "rgb": rgb, "view": view}


def convert_ism(sd: Dict[str, Any], depth: int = 4) -> Params:
    """StyleModule state dict -> ISM pytree (models/model.py:174-199)."""
    sd = _strip_module(sd)
    layers = []
    for i in range(depth):
        w, b = _linear(sd, f"linears1.Linear{i}")
        layers.append({"w": w.T.copy(), "b": b})
    ws, bs = _linear(sd, "linears_scale")
    wb, bb = _linear(sd, "linears_bias")
    return {
        "layers": layers,
        "scale": {"w": ws.T.copy(), "b": bs},
        "bias": {"w": wb.T.copy(), "b": bb},
    }


def convert_tex_encoder(sd: Dict[str, Any]) -> Params:
    """EnDeUVmap state dict -> flax TextureEncoder param pytree.

    torch convs: encoder.down1.0.{0,2,4,6,8,10,12} (Conv2d interleaved with
    LeakyReLU in an nn.Sequential); kernel [out, in, kh, kw] -> flax
    [kh, kw, in, out]. The first Dense sees torch's NCHW flatten of the
    [256, 4, 4] feature map; flax flattens NHWC, so permute its input rows.
    """
    sd = _strip_module(sd)
    p: Dict[str, Any] = {}
    conv_ids = [0, 2, 4, 6, 8, 10, 12]
    for n, ci in enumerate(conv_ids):
        w = _np(sd[f"encoder.down1.0.{ci}.weight"])
        b = _np(sd[f"encoder.down1.0.{ci}.bias"])
        p[f"Conv_{n}"] = {"kernel": w.transpose(2, 3, 1, 0).copy(), "bias": b}

    w = _np(sd["encoder.down2.0.weight"])  # [512, 256*4*4] over NCHW flatten
    b = _np(sd["encoder.down2.0.bias"])
    C, H_, W_ = 256, 4, 4
    # torch flat index: c*H*W + h*W + w ; flax flat index: h*W*C + w*C + c
    perm = np.empty(C * H_ * W_, np.int64)
    for h in range(H_):
        for w_i in range(W_):
            for c in range(C):
                perm[h * W_ * C + w_i * C + c] = c * H_ * W_ + h * W_ + w_i
    p["Dense_0"] = {"kernel": w[:, perm].T.copy(), "bias": b}

    wm, bm = _linear(sd, "encoder.mu")
    p["mu"] = {"kernel": wm.T.copy(), "bias": bm}
    for i, di in enumerate([0, 2, 4]):
        w = _np(sd[f"encoder.decoding.{di}.weight"])
        b = _np(sd[f"encoder.decoding.{di}.bias"])
        p[f"decoding_{i}"] = {"kernel": w.T.copy(), "bias": b}
    return {"params": p}


def convert_exp_codes(latents: List[Any], n_slots: int = 21, exp_dim: int = 30) -> np.ndarray:
    """List of [1, exp_dim] tensors (20 trained + optional fitting slot) ->
    [n_slots, exp_dim] bank."""
    bank = np.zeros((n_slots, exp_dim), np.float32)
    for i, t in enumerate(latents[:n_slots]):
        bank[i] = _np(t).reshape(exp_dim)
    return bank


def convert_checkpoint(
    tar_path: str,
    coarse_cfg: FieldConfig,
    fine_cfg: FieldConfig,
) -> Params:
    """Load a reference .tar and return the full model param pytree (optimizer
    state is NOT converted — Adam moments don't transfer across frameworks)."""
    import torch

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    return {
        "coarse": convert_field(ckpt["network_fn_state_dict"], coarse_cfg),
        "fine": convert_field(ckpt["network_fine_state_dict"], fine_cfg),
        "ism": convert_ism(ckpt["network_render_idSpecific"]),
        "tex_encoder": convert_tex_encoder(ckpt["network_render_textureEncoder"]),
        "exp_codes": convert_exp_codes(ckpt["expression_latent_codes_sigma"]),
    }
