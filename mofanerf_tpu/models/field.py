"""The conditioned NeRF field — TPU-first block-parameter formulation.

Capability parity with the reference 4-stage MLP (models/model.py:80-137):

    xyz_code   = xyzEncode([pts_embed(63), exp'(30)])          # skipMLP D=3
    sigma_feat = linear_BiM_xyz([shape(50), xyz_code])          # skipMLP D, skip=4
    alpha      = alpha_linear(sigma_feat)                       # W -> 1
    rgb_feat   = linear_uv_xyzBiM([tex(256), sigma_feat])       # skipMLP D, skip=4
    view_feat  = relu(Linear([dirs_embed(27), rgb_feat]))       # -> W/2
    rgb        = rgb_linear(view_feat)                          # W/2 -> 3

where exp' = ISM(shape) modulating the expression latent (see ism.py).

Design departure from the reference (the reason this is fast on TPU):
every `concat([code, features]) @ W` is stored as separate weight blocks
`features @ W_f + code @ W_c + b`. Since the conditioning codes
(shape/exp'/texture) are **constant per rendered frame**, `code @ W_c + b`
is precomputed ONCE per frame by `fold_conditioning` and the per-point hot
loop (`apply_field_folded`) runs a plain dense MLP on 63-dim inputs with the
folded biases. This is mathematically exact (a linear map over a concat is
the sum of linear maps over the parts) and removes all code-concat FLOPs and
HBM traffic from the inner loop. Likewise the view-direction contribution is
folded **per ray** (dirs are shared by all samples of a ray).

`apply_field` (the unfolded path) exists for parity tests and for uses where
codes vary per point.

Parameters are a plain pytree of jnp arrays; weights stored [in, out] so the
hot matmul is `x @ W` (row-major points on the MXU).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.ops.embed import fourier_embed, embed_dim

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static architecture config (defaults = reference fine/coarse dims,
    tools/config_parser.py:17-24,113-118 + configs/exp_mofanerf.txt)."""

    depth: int = 8               # netdepth (coarse 8 / fine 10)
    width: int = 256             # netwidth (coarse 256 / fine 1024)
    skip: int = 4                # skip-concat layer index inside trunks
    xyz_depth: int = 3           # xyzEncode depth (D=3 => 4 linear layers)
    multires: int = 10           # xyz positional encoding bands -> 63 dims
    multires_views: int = 4      # viewdir encoding bands -> 27 dims
    shape_dim: int = 50          # FaceScape identity factors
    exp_dim: int = 30            # expression latent length
    tex_dim: int = 256           # texture code length
    compute_dtype: Any = jnp.float32  # bfloat16 for the TPU hot path

    @property
    def pts_embed_dim(self) -> int:
        return embed_dim(3, self.multires)

    @property
    def views_embed_dim(self) -> int:
        return embed_dim(3, self.multires_views)


def _xavier_relu_block(key, total_in: int, out: int, block_in: int) -> jnp.ndarray:
    """Xavier-uniform with ReLU gain over the *concatenated* fan-in.

    The reference initializes each Linear over its full concat input
    (models/model.py:139-143); block weights must use the same bound so the
    folded formulation has identical init statistics.
    """
    gain = np.sqrt(2.0)
    a = gain * np.sqrt(6.0 / (total_in + out))
    return jax.random.uniform(key, (block_in, out), minval=-a, maxval=a, dtype=jnp.float32)


def _bias(key, fan_in: int, out: int) -> jnp.ndarray:
    # torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    b = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (out,), minval=-b, maxval=b, dtype=jnp.float32)


def _dense(key, total_in: int, out: int):
    kw, kb = jax.random.split(key)
    return {
        "w": _xavier_relu_block(kw, total_in, out, total_in),
        "b": _bias(kb, total_in, out),
    }


def init_field_params(key: jax.Array, cfg: FieldConfig) -> Params:
    """Build the field parameter pytree."""
    W, D, skip = cfg.width, cfg.depth, cfg.skip
    pe, ve = cfg.pts_embed_dim, cfg.views_embed_dim
    ks = jax.random.split(key, 64)
    ki = iter(range(64))

    def nk():
        return ks[next(ki)]

    # --- xyzEncode: Linear0([pts_embed, exp'] -> W) + xyz_depth x (W -> W)
    xyz_in = pe + cfg.exp_dim
    xyz = {
        "w_pts": _xavier_relu_block(nk(), xyz_in, W, pe),
        "w_exp": _xavier_relu_block(nk(), xyz_in, W, cfg.exp_dim),
        "b": _bias(nk(), xyz_in, W),
        "layers": [_dense(nk(), W, W) for _ in range(cfg.xyz_depth)],
    }

    def trunk(code_dim: int) -> Params:
        """skipMLP(D, W, input_ch=code_dim+W, skip): layer0 + `skip` mid
        layers, then a skip layer on [code, feat_in, h] + (D-skip-2) post
        layers (reference models/model.py:202-230)."""
        t_in = code_dim + W
        sk_in = t_in + W  # concat([x, h])
        return {
            "w_code0": _xavier_relu_block(nk(), t_in, W, code_dim),
            "w_feat0": _xavier_relu_block(nk(), t_in, W, W),
            "b0": _bias(nk(), t_in, W),
            "mid": [_dense(nk(), W, W) for _ in range(skip)],
            "w_skip_code": _xavier_relu_block(nk(), sk_in, W, code_dim),
            "w_skip_feat": _xavier_relu_block(nk(), sk_in, W, W),
            "w_skip_h": _xavier_relu_block(nk(), sk_in, W, W),
            "b_skip": _bias(nk(), sk_in, W),
            "post": [_dense(nk(), W, W) for _ in range(D - skip - 2)],
        }

    sigma = trunk(cfg.shape_dim)
    sigma["alpha"] = _dense(nk(), W, 1)
    rgb = trunk(cfg.tex_dim)

    view_in = ve + W
    view = {
        "w_dirs": _xavier_relu_block(nk(), view_in, W // 2, ve),
        "w_feat": _xavier_relu_block(nk(), view_in, W // 2, W),
        "b": _bias(nk(), view_in, W // 2),
        "rgb": _dense(nk(), W // 2, 3),
    }

    return {"xyz": xyz, "sigma": sigma, "rgb": rgb, "view": view}


def field_param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Conditioning fold: codes -> per-frame biases
# ---------------------------------------------------------------------------

def fold_conditioning(
    params: Params,
    shape_code: jnp.ndarray,  # [shape_dim]
    exp_code: jnp.ndarray,    # [exp_dim]  (already ISM-modulated)
    tex_code: jnp.ndarray,    # [tex_dim]
) -> Params:
    """Precompute the code contributions to every code-consuming layer.

    Returns a small pytree of per-frame bias vectors. Differentiable w.r.t.
    the codes, so fitting-by-gradient flows through the fold.
    """
    x, s, r = params["xyz"], params["sigma"], params["rgb"]
    return {
        "xyz_b": x["b"] + exp_code @ x["w_exp"],
        "sigma_b0": s["b0"] + shape_code @ s["w_code0"],
        "sigma_bskip": s["b_skip"] + shape_code @ s["w_skip_code"],
        "rgb_b0": r["b0"] + tex_code @ r["w_code0"],
        "rgb_bskip": r["b_skip"] + tex_code @ r["w_skip_code"],
    }


def _trunk_apply(t: Params, feat_in, b0, bskip, dtype):
    """Run a skip trunk on per-point features with folded code biases."""
    h = jax.nn.relu(feat_in @ t["w_feat0"].astype(dtype) + b0.astype(dtype))
    for layer in t["mid"]:
        h = jax.nn.relu(h @ layer["w"].astype(dtype) + layer["b"].astype(dtype))
    h = jax.nn.relu(
        feat_in @ t["w_skip_feat"].astype(dtype)
        + h @ t["w_skip_h"].astype(dtype)
        + bskip.astype(dtype)
    )
    for layer in t["post"]:
        h = jax.nn.relu(h @ layer["w"].astype(dtype) + layer["b"].astype(dtype))
    return h


def apply_field_folded(
    params: Params,
    cond: Params,
    pts_embed: jnp.ndarray,   # [N, pts_embed_dim]
    dir_feat: jnp.ndarray,    # [N, W//2] or [R, W//2] with N = R*S (see below)
    cfg: FieldConfig,
    samples_per_ray: int | None = None,
):
    """Hot path: embedded points -> (raw_rgb [N,3], raw_sigma [N,1]).

    `dir_feat` is `dirs_embed @ view.w_dirs`, computed once per ray. When
    `samples_per_ray` is given, dir_feat is per-RAY [R, W//2] and is
    broadcast across each ray's S samples at the view layer via a reshape —
    avoiding a materialized [N, W//2] repeat (0.5 GB of HBM traffic at
    production shapes)."""
    dt = cfg.compute_dtype
    x = pts_embed.astype(dt)

    xyz = params["xyz"]
    h = jax.nn.relu(x @ xyz["w_pts"].astype(dt) + cond["xyz_b"].astype(dt))
    for layer in xyz["layers"]:
        h = jax.nn.relu(h @ layer["w"].astype(dt) + layer["b"].astype(dt))
    xyz_code = h

    s = params["sigma"]
    sigma_feat = _trunk_apply(s, xyz_code, cond["sigma_b0"], cond["sigma_bskip"], dt)
    raw_sigma = sigma_feat @ s["alpha"]["w"].astype(dt) + s["alpha"]["b"].astype(dt)

    rgb_feat = _trunk_apply(
        params["rgb"], sigma_feat, cond["rgb_b0"], cond["rgb_bskip"], dt
    )

    v = params["view"]
    pre_view = rgb_feat @ v["w_feat"].astype(dt) + v["b"].astype(dt)
    if samples_per_ray is not None:
        n_rays = dir_feat.shape[0]
        w2 = pre_view.shape[-1]
        pre_view = pre_view.reshape(n_rays, samples_per_ray, w2)
        view_feat = jax.nn.relu(pre_view + dir_feat.astype(dt)[:, None, :])
        view_feat = view_feat.reshape(-1, w2)
    else:
        view_feat = jax.nn.relu(pre_view + dir_feat.astype(dt))
    raw_rgb = view_feat @ v["rgb"]["w"].astype(dt) + v["rgb"]["b"].astype(dt)
    return raw_rgb, raw_sigma


def apply_field_sigma(
    params: Params,
    cond: Params,
    pts_embed: jnp.ndarray,  # [N, pts_embed_dim]
    cfg: FieldConfig,
) -> jnp.ndarray:
    """Density-only apply: xyz encoder + sigma trunk + alpha head, skipping
    the rgb trunk and view head (~half the FLOPs). Used by occupancy-grid
    probing, where only sigma matters."""
    dt = cfg.compute_dtype
    x = pts_embed.astype(dt)
    xyz = params["xyz"]
    h = jax.nn.relu(x @ xyz["w_pts"].astype(dt) + cond["xyz_b"].astype(dt))
    for layer in xyz["layers"]:
        h = jax.nn.relu(h @ layer["w"].astype(dt) + layer["b"].astype(dt))
    s = params["sigma"]
    sigma_feat = _trunk_apply(s, h, cond["sigma_b0"], cond["sigma_bskip"], dt)
    return sigma_feat @ s["alpha"]["w"].astype(dt) + s["alpha"]["b"].astype(dt)


def apply_field(
    params: Params,
    pts: jnp.ndarray,        # [N, 3]
    viewdirs: jnp.ndarray,   # [N, 3] unit vectors
    shape_code: jnp.ndarray,  # [shape_dim]
    exp_code: jnp.ndarray,    # [exp_dim] (ISM-modulated)
    tex_code: jnp.ndarray,    # [tex_dim]
    cfg: FieldConfig,
):
    """Reference-equivalent unfolded apply (parity/testing path)."""
    pe = fourier_embed(pts, cfg.multires)
    de = fourier_embed(viewdirs, cfg.multires_views)
    cond = fold_conditioning(params, shape_code, exp_code, tex_code)
    dir_feat = de @ params["view"]["w_dirs"]
    return apply_field_folded(params, cond, pe, dir_feat, cfg)
