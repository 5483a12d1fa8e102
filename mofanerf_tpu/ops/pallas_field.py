"""Pallas fused ray-field kernel.

Evaluates the ENTIRE conditioned-NeRF point pipeline — xyz encoder, sigma
trunk (with skip), alpha head, rgb trunk (with skip), view head — in one
kernel, tiled over point blocks. Per block, every intermediate activation
lives in VMEM; the [W, W] hidden weights stream from HBM with a
double-buffered async-DMA pipeline, so each layer's weight load overlaps
the previous layer's matmul.

Why: under plain XLA each of the ~22 hidden layers round-trips its
[N, 1024] activation through HBM (~45 GB of traffic for a 4096-ray fine
pass — ~30% of step time on a v5e). Weight streaming costs only
  n_blocks * total_weight_bytes
which for block=512..1024 points is ~4x smaller, and is hidden behind the
MXU anyway.

The kernel consumes the SAME param pytree as the XLA path via
`pack_fused_params` (conditioning biases pre-folded — see
models/field.py::fold_conditioning) and is parity-tested against it.
Inference path only (bench / frame rendering); training uses the
autodiff'd XLA path.

Layer plan (skip=4, xyz_depth=3; reference architecture
models/model.py:80-137 re-expressed as block matmuls):
  stack[0..2]    xyz hidden layers
  stack[3]       sigma trunk L0 (bias = folded shape code)
  stack[4..7]    sigma mid
  stack[8],[9]   sigma skip pair: xyz_code @ W8 + h @ W9 (+ folded bias)
  stack[10..10+D-7]  sigma post
  ... same shape again for the rgb trunk (bias = folded texture code)
Small heads (first layer from padded 63-dim embed, view W->W/2, alpha/rgb
outputs padded to 128 lanes) are ordinary VMEM operands.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mofanerf_tpu.models.field import FieldConfig

Params = Dict[str, Any]

LANE = 128


class FusedParams(NamedTuple):
    """Stacked, padded, bf16 parameters for the fused kernel."""

    w_stack: jnp.ndarray   # [L, W, W] bf16 hidden weights (HBM-streamed)
    b_stack: jnp.ndarray   # [L, W] f32 biases (conditioning pre-folded)
    w_pts: jnp.ndarray     # [LANE, W] bf16 (63-dim embed zero-padded)
    b_pts: jnp.ndarray     # [W] f32 (xyz folded bias)
    w_view: jnp.ndarray    # [W, W2] bf16
    b_view: jnp.ndarray    # [W2] f32
    w_out: jnp.ndarray     # [W + W2, LANE] bf16: alpha (rows 0..W-1 -> col 3)
                           # and rgb (rows W.. -> cols 0..2), fused output head
    b_out: jnp.ndarray     # [LANE] f32


def _plan_len(cfg: FieldConfig) -> int:
    # xyz hidden + 2 trunks of (L0 + skip_mid + skip_pair(2) + post)
    per_trunk = 1 + cfg.skip + 2 + (cfg.depth - cfg.skip - 2)
    return cfg.xyz_depth + 2 * per_trunk


def pack_fused_params(params: Params, cond: Params, cfg: FieldConfig) -> FusedParams:
    """Field params + folded conditioning -> kernel operand set."""
    W = cfg.width
    W2 = W // 2
    pe = cfg.pts_embed_dim
    bf = jnp.bfloat16

    ws, bs = [], []

    def push(w, b):
        ws.append(w.astype(bf))
        bs.append(b.astype(jnp.float32))

    x = params["xyz"]
    for layer in x["layers"]:
        push(layer["w"], layer["b"])

    def push_trunk(t, b0_folded, bskip_folded):
        push(t["w_feat0"], b0_folded)
        for layer in t["mid"]:
            push(layer["w"], layer["b"])
        push(t["w_skip_feat"], jnp.zeros(W))       # bias carried by the pair's 2nd half
        push(t["w_skip_h"], bskip_folded)
        for layer in t["post"]:
            push(layer["w"], layer["b"])

    push_trunk(params["sigma"], cond["sigma_b0"], cond["sigma_bskip"])
    push_trunk(params["rgb"], cond["rgb_b0"], cond["rgb_bskip"])

    w_stack = jnp.stack(ws)
    b_stack = jnp.stack(bs)
    assert w_stack.shape[0] == _plan_len(cfg)

    w_pts = jnp.zeros((LANE, W), bf).at[:pe].set(x["w_pts"].astype(bf))
    b_pts = cond["xyz_b"].astype(jnp.float32)  # includes folded expression code

    v = params["view"]
    w_view = v["w_feat"].astype(bf)
    b_view = v["b"].astype(jnp.float32)

    # fused output head: out[:, 0:3] = rgb, out[:, 3] = sigma
    s = params["sigma"]
    w_out = jnp.zeros((W + W2, LANE), bf)
    w_out = w_out.at[:W, 3:4].set(s["alpha"]["w"].astype(bf))
    w_out = w_out.at[W:, 0:3].set(v["rgb"]["w"].astype(bf))
    b_out = jnp.zeros(LANE, jnp.float32)
    b_out = b_out.at[3].set(s["alpha"]["b"][0])
    b_out = b_out.at[0:3].set(v["rgb"]["b"])

    return FusedParams(w_stack, b_stack, w_pts, b_pts, w_view, b_view, w_out, b_out)


def _field_kernel(
    cfg: FieldConfig,
    block: int,
    rays_per_block: int,
    # refs:
    x_ref, dir_ref, b_stack_ref, w_pts_ref, b_pts_ref,
    w_view_ref, b_view_ref, w_out_ref, b_out_ref,
    w_hbm_ref,
    out_ref,
    # scratch:
    wbuf, sems, sv1, sv2,
):
    W = cfg.width
    W2 = W // 2
    L = _plan_len(cfg)
    D, skip, xd = cfg.depth, cfg.skip, cfg.xyz_depth
    post = D - skip - 2
    f32 = jnp.float32
    bf = jnp.bfloat16

    def load(l, slot):
        return pltpu.make_async_copy(w_hbm_ref.at[l], wbuf.at[slot], sems.at[slot])

    load(0, 0).start()

    def dense(h, l, relu=True):
        """h @ stack[l] + b[l], with the next layer's DMA prefetched."""
        load(l, l % 2).wait()
        if l + 1 < L:
            load(l + 1, (l + 1) % 2).start()
        y = jnp.dot(h, wbuf[l % 2], preferred_element_type=f32) + b_stack_ref[l][None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(bf)

    # xyz encoder
    h = jnp.dot(x_ref[:], w_pts_ref[:], preferred_element_type=f32) + b_pts_ref[:][None, :]
    h = jnp.maximum(h, 0.0).astype(bf)
    li = 0
    for _ in range(xd):
        h = dense(h, li); li += 1
    sv1[:] = h  # xyz_code

    def trunk(sv_ref, li):
        h = dense(sv_ref[:], li); li += 1
        for _ in range(skip):
            h = dense(h, li); li += 1
        # skip pair: sv @ W[li] (no bias/relu) + h @ W[li+1] (+bias, relu)
        load(li, li % 2).wait()
        if li + 1 < L:
            load(li + 1, (li + 1) % 2).start()
        part = jnp.dot(sv_ref[:], wbuf[li % 2], preferred_element_type=f32)
        li += 1
        load(li, li % 2).wait()
        if li + 1 < L:
            load(li + 1, (li + 1) % 2).start()
        h = part + jnp.dot(h, wbuf[li % 2], preferred_element_type=f32) \
            + b_stack_ref[li][None, :]
        h = jnp.maximum(h, 0.0).astype(bf)
        li += 1
        for _ in range(post):
            h = dense(h, li); li += 1
        return h, li

    sigma_feat, li = trunk(sv1, li)
    sv2[:] = sigma_feat
    rgb_feat, li = trunk(sv2, li)

    # view head with per-ray dir broadcast over samples
    pre = jnp.dot(rgb_feat, w_view_ref[:], preferred_element_type=f32) \
        + b_view_ref[:][None, :]
    samples = block // rays_per_block
    pre = pre.reshape(rays_per_block, samples, W2) + dir_ref[:][:, None, :]
    view = jnp.maximum(pre, 0.0).astype(bf).reshape(block, W2)

    # fused output: [sigma_feat | view] @ w_out -> cols 0..2 rgb, col 3 sigma
    out = (
        jnp.dot(sv2[:], w_out_ref[:W], preferred_element_type=f32)
        + jnp.dot(view, w_out_ref[W:], preferred_element_type=f32)
        + b_out_ref[:][None, :]
    )
    out_ref[:] = out.astype(f32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "samples_per_ray", "block_rays", "interpret")
)
def fused_field_apply(
    fused: FusedParams,
    pts_embed: jnp.ndarray,      # [N, pts_embed_dim] with N = R * S
    dir_feat: jnp.ndarray,       # [R, W//2] per-ray folded view features
    cfg: FieldConfig,
    samples_per_ray: int,
    block_rays: int = 8,
    interpret: bool = False,
):
    """Returns (raw_rgb [N, 3], raw_sigma [N, 1]) — same contract as
    models/field.py::apply_field_folded."""
    W = cfg.width
    W2 = W // 2
    S = samples_per_ray
    R = dir_feat.shape[0]
    N = pts_embed.shape[0]
    assert N == R * S, (N, R, S)
    block = block_rays * S
    assert N % block == 0, f"N={N} not divisible by block={block}"
    n_blocks = N // block

    x = jnp.zeros((N, LANE), jnp.bfloat16).at[:, : pts_embed.shape[1]].set(
        pts_embed.astype(jnp.bfloat16)
    )
    # f32 keeps the (block_rays, W2) block at the f32 (8,128) min tile
    dirf = dir_feat.astype(jnp.float32)

    kernel = functools.partial(_field_kernel, cfg, block, block_rays)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, W2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_stack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_pts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_pts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_view
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_view
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_out
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_out
            pl.BlockSpec(memory_space=pltpu.ANY),    # w_stack stays in HBM
        ],
        out_specs=pl.BlockSpec((block, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W, W), jnp.bfloat16),     # weight double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block, W), jnp.bfloat16),    # xyz_code
            pltpu.VMEM((block, W), jnp.bfloat16),    # sigma_feat
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * W * W * _plan_len(cfg),
            bytes_accessed=n_blocks * _plan_len(cfg) * W * W * 2 + N * LANE * 6,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, dirf, fused.b_stack, fused.w_pts, fused.b_pts,
      fused.w_view, fused.b_view, fused.w_out, fused.b_out, fused.w_stack)

    return out[:, 0:3], out[:, 3:4]
