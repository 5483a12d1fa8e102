"""Where does the fused serve kernel's time go? Ablate kernel stages and
time each variant on the real chip.

The S32 serving path sustains ~26 TFLOP/s (~13% of v5e bf16 peak); the
matmuls alone should take ~8us/block vs ~50us observed. Variants (each
keeps the output dependent on what remains, so Mosaic can't DCE):

  full        complete kernel (baseline)
  no_sin      embedding = affine only (isolates the sin transcendentals)
  no_comp     no transmittance loop (sum rgb*sigma instead)
  no_view     no view head (sigma-only; isolates pre/rgb matmuls + sigmoid)
  no_trunk    depth=0 trunk (isolates the 4 [128x128] matmuls)
  sin_doubling / sin_doubling2 / sin_bf16 / cumsum_comp: attempted
              optimizations (see MEASURED below)

MEASURED (v5e, 49.3us/block full; .out files in this dir):
  sin 16.1us (33%!) | view head 5.0us | trunk matmuls 5.9us |
  rest (placement/input/sigma/composite/pipeline) ~22us.
  The kernel is TRANSCENDENTAL-bound, not matmul-bound (~15 cycles/sin).
  Dead ends, all measured: angle-doubling recurrence (both layouts) and
  bf16 sin CRASH the Mosaic compiler; cumsum compositing is an
  unimplemented Mosaic primitive; and fewer embedding bands (mr 8->6/5/4)
  change NOTHING (5.0-5.2M rays/s throughout) because sin is evaluated on
  whole 128-lane tiles — width below 128 is free, rows are what cost.
  Conclusion: ~5.1M rays/s at S32 / ~8.5M at S16 is the honest ceiling of
  this architecture on this compiler; further gains need fewer ROWS
  (fewer samples — the S16 latency mode) or a future Mosaic.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scratch/exp_serve_breakdown.py [variants]
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.ops.bounds import ray_aabb_interval
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.pallas_serve import _embed_constants

import os

CFG = StudentConfig(depth=4, width=128,
                    multires=int(os.environ.get("MR", "8")))
NEAR, FAR = 8.0, 26.0
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)
K_INNER = 16
N = 65536
R = 256
S = 32


def make_kernel(variant):
    D = 0 if variant == "no_trunk" else CFG.depth
    dt = CFG.compute_dtype

    def kernel(o_ref, d_ref, aux_ref, dirf_ref, A_ref, phase_ref,
               w0p_ref, w0s_ref, b0_ref, wl_ref, bl_ref,
               wsig_ref, bsig_ref, wfeat_ref, bfeat_ref, wrgb_ref, brgb_ref,
               out_ref):
        t0 = aux_ref[:, 0]
        t1 = aux_ref[:, 1]
        hit = aux_ref[:, 2]
        normd = aux_ref[:, 3]
        u = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0).astype(
            jnp.float32) / max(S - 1, 1)
        z = t0[None, :] + (t1 - t0)[None, :] * u
        zf = z.reshape(S * R, 1)
        o_t = jnp.tile(o_ref[:], (S, 1))
        d_t = jnp.tile(d_ref[:], (S, 1))
        pts = o_t + d_t * zf

        mr = CFG.multires
        if variant == "sin_doubling2":
            # same recurrence, but assemble channels via stack+reshape
            # ([N, 2mr, 3] -> [N, 6mr] is a row-major no-op) instead of a
            # 16-way lane concat (which crashes the compiler)
            s = jnp.sin(pts)
            c = jnp.cos(pts)
            pieces = []
            for k in range(mr):
                pieces.append(s)
                pieces.append(c)
                if k < mr - 1:
                    s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            emb = jnp.stack(pieces, axis=1).reshape(S * R, 6 * mr)
        elif variant == "sin_bf16":
            arg = jnp.dot(pts, A_ref[:], preferred_element_type=jnp.float32)
            emb = jnp.sin((arg + phase_ref[:]).astype(jnp.bfloat16))
        elif variant == "sin_doubling":
            # frequencies are exactly 2^k: sin/cos at the base frequency
            # (6 transcendentals/point) then angle-doubling recurrences
            # (pure multiplies) for the remaining bands
            s = jnp.sin(pts)
            c = jnp.cos(pts)
            pieces = []
            for k in range(mr):
                pieces.append(s)
                pieces.append(c)
                if k < mr - 1:
                    s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            emb = jnp.concatenate(pieces, axis=1)
        else:
            arg = jnp.dot(pts, A_ref[:], preferred_element_type=jnp.float32)
            emb = arg + phase_ref[:] if variant == "no_sin" else jnp.sin(
                arg + phase_ref[:])

        def mm(a, b):
            return jnp.dot(a.astype(dt), b.astype(dt),
                           preferred_element_type=jnp.float32)

        h = mm(pts, w0p_ref[:]) + mm(emb, w0s_ref[:]) + b0_ref[:]
        h = jax.nn.relu(h).astype(dt)
        for i in range(D):
            h = jax.nn.relu(mm(h, wl_ref[i]) + bl_ref[i]).astype(dt)

        sig = mm(h, wsig_ref[:]) + bsig_ref[0, 0]
        if variant == "no_view":
            rgb = jnp.concatenate([sig, sig, sig], axis=1)
        else:
            pre = jax.nn.relu(
                mm(h, wfeat_ref[:]) + bfeat_ref[:]
                + jnp.tile(dirf_ref[:], (S, 1))
            )
            rgb = jax.nn.sigmoid(mm(pre, wrgb_ref[:]) + brgb_ref[:])

        sig_sr = jax.nn.relu(sig.reshape(S, R)) * hit[None, :]
        if variant == "cumsum_comp":
            delta = (t1 - t0) / max(S - 1, 1) * normd
            alpha = 1.0 - jnp.exp(-sig_sr * delta[None, :])
            alpha_last = 1.0 - jnp.exp(-sig_sr[S - 1] * (1e10 * normd))
            alpha = jnp.concatenate([alpha[:S - 1], alpha_last[None]], axis=0)
            logt = jnp.log(1.0 - alpha + 1e-10)
            cl = jnp.cumsum(logt, axis=0)
            T = jnp.exp(jnp.concatenate(
                [jnp.zeros((1, R), jnp.float32), cl[:S - 1]], axis=0))
            w = alpha * T                                  # [S, R]
            acc_rgb = jnp.sum(w[:, :, None] * rgb.reshape(S, R, 3), axis=0)
            acc_w = jnp.sum(w, axis=0)
            acc_zw = jnp.sum(w * z, axis=0)
        elif variant == "no_comp":
            w_all = sig_sr * (t1 - t0)[None, :] * normd[None, :]
            acc_rgb = jnp.zeros((R, 3), jnp.float32)
            for s in range(S):
                acc_rgb = acc_rgb + w_all[s][:, None] * rgb[s * R:(s + 1) * R]
            acc_w = jnp.sum(w_all, axis=0)
            acc_zw = jnp.sum(w_all * z, axis=0)
        else:
            delta = (t1 - t0) / max(S - 1, 1) * normd
            alpha = 1.0 - jnp.exp(-sig_sr * delta[None, :])
            alpha_last = 1.0 - jnp.exp(-sig_sr[S - 1] * (1e10 * normd))
            T = jnp.ones((R,), jnp.float32)
            acc_rgb = jnp.zeros((R, 3), jnp.float32)
            acc_w = jnp.zeros((R,), jnp.float32)
            acc_zw = jnp.zeros((R,), jnp.float32)
            for s in range(S):
                a = alpha[s] if s < S - 1 else alpha_last
                w = a * T
                acc_rgb = acc_rgb + w[:, None] * rgb[s * R:(s + 1) * R]
                acc_w = acc_w + w
                acc_zw = acc_zw + w * z[s]
                T = T * (1.0 - a + 1e-10)

        out_ref[:, 0:3] = acc_rgb
        out_ref[:, 3] = acc_w
        out_ref[:, 4] = acc_zw
        out_ref[:, 5:8] = jnp.zeros((R, 3), jnp.float32)

    return kernel


def run_variant(variant, params, ro, rd):
    W = CFG.width
    W2 = W // 2
    mr = CFG.multires
    dt = CFG.compute_dtype
    t0, t1, hit = ray_aabb_interval(ro, rd, AABB_MIN, AABB_MAX, NEAR, FAR)
    normd = jnp.linalg.norm(rd, axis=-1)
    aux = jnp.stack([t0, t1, hit.astype(jnp.float32), normd], axis=-1)
    viewdirs = rd / normd[:, None]
    de = fourier_embed(viewdirs, CFG.multires_views)
    dirf = (de @ params["view"]["w_dirs"]).astype(dt)
    A, phase = _embed_constants(mr)
    w_in = params["input"]["w"].astype(dt)
    w0p, w0s = w_in[:3], w_in[3:]
    b0 = params["input"]["b"].reshape(1, W)
    wl = jnp.stack([l["w"] for l in params["layers"]]).astype(dt)
    bl = jnp.stack([l["b"] for l in params["layers"]])
    args = (ro, rd, aux, dirf, jnp.asarray(A), jnp.asarray(phase),
            w0p, w0s, b0, wl, bl,
            params["sigma"]["w"].astype(dt), params["sigma"]["b"].reshape(1, 1),
            params["feat"]["w"].astype(dt), params["feat"]["b"].reshape(1, W2),
            params["rgb"]["w"].astype(dt), params["rgb"]["b"].reshape(1, 3))

    row_block = lambda width: pl.BlockSpec((R, width), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(variant),
        grid=(N // R,),
        in_specs=[row_block(3), row_block(3), row_block(4), row_block(W2),
                  const(3, 6 * mr), const(1, 6 * mr), const(3, W),
                  const(6 * mr, W), const(1, W), const(CFG.depth, W, W),
                  const(CFG.depth, W), const(W, 1), const(1, 1),
                  const(W, W2), const(1, W2), const(W2, 3), const(1, 3)],
        out_specs=pl.BlockSpec((R, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
    )

    @jax.jit
    def loop(o, d):
        def body(i, acc):
            out = call(*((o + i * 1e-6, d) + args[2:]))
            return acc + jnp.sum(out[:, 0])
        return jax.lax.fori_loop(0, K_INNER, body, 0.0)

    float(loop(ro, rd))
    t = time.perf_counter()
    float(loop(ro, rd))
    sec = (time.perf_counter() - t) / K_INNER
    return N / sec, sec / (N // R) * 1e6


def main():
    print("device:", jax.devices()[0], flush=True)
    params, _ = init_point_field(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.zeros((N, 3))
    rd = jnp.asarray(d)

    results = {}
    import sys

    variants = (sys.argv[1].split(",") if len(sys.argv) > 1 else
                ("full", "no_sin", "no_comp", "no_view", "no_trunk"))
    for variant in variants:
        try:
            rps, us_blk = run_variant(variant, params, ro, rd)
            results[variant] = {"rays_per_sec": round(rps, 1),
                                "us_per_block": round(us_blk, 2)}
            print(f"{variant}: {rps/1e6:.2f}M rays/s, {us_blk:.1f} us/block",
                  flush=True)
        except Exception as e:
            results[variant] = f"FAIL {str(e)[:160]}"
            print(f"{variant}: FAILED {str(e)[:160]}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
