"""Lean unconditioned point field — the distillation target for serving.

The conditioned field (models/field.py) carries architecture the serving
path doesn't need once codes are folded: a 4-layer xyz encoder and two
skip trunks exist to mix three conditioning streams
(reference models/model.py:80-137). A per-avatar student has NO codes, so
this module provides a vanilla NeRF-style MLP half the matmul count at
equal width: embed -> depth x (W dense, one optional skip) -> sigma head
+ view-conditioned rgb head. At width 128 this is ~0.13 MFLOP/point vs
~0.52 for the trunk form — measured 4x serving throughput at equal width.

Interface-compatible with the field machinery: params carry the same
`view.w_dirs` entry, and `point_apply` dispatches (pe, dirf) -> (raw_rgb,
raw_sigma) over both config types so renderers and the distiller are
architecture-agnostic.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import (
    FieldConfig,
    _bias,
    _xavier_relu_block,
    apply_field_folded,
    fold_conditioning,
)
from mofanerf_tpu.ops.embed import embed_dim

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class StudentConfig:
    depth: int = 4               # dense trunk layers after the input layer
    width: int = 128
    skip: int = -1               # trunk index to re-inject pe (-1 = none)
    multires: int = 8            # serving nets tolerate fewer bands; measure
    multires_views: int = 4
    cond_dim: int = 0            # >0: code-conditioned student — a `cond_dim`
                                 # code (e.g. the ISM-modulated expression
                                 # latent, 30) contributes a bias to the
                                 # input layer and every trunk layer. Codes
                                 # fold to plain biases per frame
                                 # (`fold_student_code`), so the serving hot
                                 # path — including the fused Pallas kernel
                                 # — is IDENTICAL to the unconditioned
                                 # student's: one student serves all 20
                                 # expressions + interpolations for free.
    compute_dtype: Any = jnp.bfloat16

    @property
    def pts_embed_dim(self) -> int:
        return embed_dim(3, self.multires)

    @property
    def views_embed_dim(self) -> int:
        return embed_dim(3, self.multires_views)


def init_student_params(key: jax.Array, cfg: StudentConfig) -> Params:
    W = cfg.width
    pe, ve = cfg.pts_embed_dim, cfg.views_embed_dim
    cd = cfg.cond_dim
    ks = jax.random.split(key, 6 + 2 * cfg.depth + 8)
    ki = iter(range(len(ks)))

    def nk():
        return ks[next(ki)]

    def dense(total_in, out, block_in=None):
        return {
            "w": _xavier_relu_block(nk(), total_in, out, block_in or total_in),
            "b": _bias(nk(), total_in, out),
        }

    layers = []
    for i in range(cfg.depth):
        t_in = W + (pe if i == cfg.skip else 0)
        layers.append(dense(t_in, W))
    params = {
        # conditioned: the input layer's true fan-in is concat([pe, code])
        "input": dense(pe + cd, W, block_in=pe) if cd else dense(pe, W),
        "layers": layers,
        "sigma": dense(W, 1),
        "feat": dense(W, W // 2),
        "view": {"w_dirs": _xavier_relu_block(nk(), ve + W, W // 2, ve)},
        "rgb": dense(W // 2, 3),
    }
    if cd:
        params["cond"] = {
            "w_in": _xavier_relu_block(nk(), pe + cd, W, cd),
            # trunk injections start at zero: the conditioned student begins
            # exactly as an unconditioned one and gradients grow per-layer
            # code sensitivity only where the distillation target needs it
            "w_layers": jnp.zeros((cfg.depth, cd, W), jnp.float32),
        }
    return params


def fold_student_code(params: Params, code: jnp.ndarray) -> Params:
    """Fold a conditioning code [cond_dim] into plain student params.

    `concat([x, code]) @ W == x @ W_x + code @ W_c`, so the code's
    contribution is a bias: `b0' = b0 + code @ w_in`,
    `bl_i' = bl_i + code @ w_layers[i]`. The result has the EXACT layout of
    an unconditioned student — every renderer (incl. the fused Pallas
    kernel, ops/pallas_serve.py) runs it unchanged at unchanged cost.
    Differentiable w.r.t. both params and code (distillation and fitting
    flow through the fold)."""
    if "cond" not in params:
        return params
    c = params["cond"]
    folded = {k: v for k, v in params.items() if k != "cond"}
    folded["input"] = {
        "w": params["input"]["w"],
        "b": params["input"]["b"] + code @ c["w_in"],
    }
    folded["layers"] = [
        {"w": l["w"], "b": l["b"] + code @ c["w_layers"][i]}
        for i, l in enumerate(params["layers"])
    ]
    return folded


def student_param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def apply_student(
    params: Params,
    pts_embed: jnp.ndarray,   # [N, pe]
    dir_feat: jnp.ndarray,    # [N or R, W//2] (= dirs_embed @ view.w_dirs)
    cfg: StudentConfig,
    samples_per_ray: int | None = None,
):
    """(pe, dirf) -> (raw_rgb [N,3], raw_sigma [N,1]); same contract as
    apply_field_folded incl. the per-ray dir_feat broadcast."""
    dt = cfg.compute_dtype
    x = pts_embed.astype(dt)
    h = jax.nn.relu(x @ params["input"]["w"].astype(dt)
                    + params["input"]["b"].astype(dt))
    for i, layer in enumerate(params["layers"]):
        if i == cfg.skip:
            h = jnp.concatenate([h, x], axis=-1)
        h = jax.nn.relu(h @ layer["w"].astype(dt) + layer["b"].astype(dt))
    raw_sigma = h @ params["sigma"]["w"].astype(dt) + params["sigma"]["b"].astype(dt)

    pre = h @ params["feat"]["w"].astype(dt) + params["feat"]["b"].astype(dt)
    if samples_per_ray is not None:
        n_rays = dir_feat.shape[0]
        w2 = pre.shape[-1]
        pre = pre.reshape(n_rays, samples_per_ray, w2)
        vf = jax.nn.relu(pre + dir_feat.astype(dt)[:, None, :]).reshape(-1, w2)
    else:
        vf = jax.nn.relu(pre + dir_feat.astype(dt))
    raw_rgb = vf @ params["rgb"]["w"].astype(dt) + params["rgb"]["b"].astype(dt)
    return raw_rgb, raw_sigma


# ---------------------------------------------------------------------------
# Architecture-agnostic dispatch
# ---------------------------------------------------------------------------

def point_apply(params, cond, pts_embed, dir_feat, cfg, samples_per_ray=None):
    """(pe, dirf) -> (raw_rgb, raw_sigma) for either field family. For
    StudentConfig, `cond` is the conditioning code [cond_dim] (folded into
    biases here — tiny matmuls) or None for unconditioned students; omitting
    it on a conditioned student is equivalent to code = 0."""
    if isinstance(cfg, StudentConfig):
        if cond is not None:
            params = fold_student_code(params, cond)
        return apply_student(params, pts_embed, dir_feat, cfg, samples_per_ray)
    return apply_field_folded(params, cond, pts_embed, dir_feat, cfg, samples_per_ray)


def init_point_field(key, cfg):
    """Init either family. Returns (params, cond) — cond None for students,
    a folded zero-code conditioning for FieldConfigs."""
    if isinstance(cfg, StudentConfig):
        return init_student_params(key, cfg), None
    from mofanerf_tpu.models.field import init_field_params

    params = init_field_params(key, cfg)
    cond = fold_conditioning(
        params,
        jnp.zeros(cfg.shape_dim), jnp.zeros(cfg.exp_dim), jnp.zeros(cfg.tex_dim),
    )
    return params, cond


def refold_cond(params, cfg):
    """Recompute the zero-code conditioning after a parameter update (the
    folded biases are functions of the params). None for students."""
    if isinstance(cfg, StudentConfig):
        return None
    return fold_conditioning(
        params,
        jnp.zeros(cfg.shape_dim), jnp.zeros(cfg.exp_dim), jnp.zeros(cfg.tex_dim),
    )
