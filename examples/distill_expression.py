"""Expression-conditioned distillation study: ONE student, whole bank.

The reference rigs expressions by sweeping latents through the full field
(run_fit.py:379-431, `rendering_modulation`) — ~5.9 GFLOP/ray. The serving
path distills per-avatar students instead, but a per-(identity, expression)
student can't interpolate expressions and costs one distillation per pose.
This study validates the third option: a code-conditioned student
(models/student.py, cond_dim=exp_dim) distilled ONCE over the expression
simplex (train/distill.py::distill_expressions), whose code folds to biases
so serving cost is identical to an unconditioned student's.

End-to-end on synthetic data (no downloads):
1. train a two-expression teacher (small/large cube) — the
   examples/expression_synthetic.py scene;
2. distill one conditioned student across both expressions;
3. per expression: PSNR of the served render vs the teacher's two-pass
   render, vs an unconditioned per-expression student baseline distilled
   with the same per-expression step budget;
4. the midpoint code must render geometry BETWEEN the two expressions
   (coverage area strictly between) — interpolation the per-expression
   students cannot do;
5. write artifacts JSON.

Usage: python examples/distill_expression.py [--iters 2500] [--cpu]
       [--artifacts artifacts/cond_student_quality.json]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_distill_exp")
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--distill_steps", type=int, default=3000)
    p.add_argument("--student_width", type=int, default=128)
    p.add_argument("--student_depth", type=int, default=4)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--artifacts", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="tiny budgets (CI/CPU smoke)")
    p.add_argument("--flagship", action="store_true",
                   help="teacher at reference dims (8x256 + 10x1024 bf16, "
                        "reference lr) — the rigging-at-scale study")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.iters, args.distill_steps, args.res = 800, 500, 48

    import numpy as np
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from mofanerf_tpu.datagen.multiview import render_identity
    from mofanerf_tpu.data.facescape import load_facescape_data
    from mofanerf_tpu.models.field import FieldConfig
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, prepare_conditioning, render_frame,
        encode_texture, exp_code_for,
    )
    from mofanerf_tpu.render.serve import render_frame_serve
    from mofanerf_tpu.train.distill import (
        DistillConfig, distill, distill_expressions, student_code,
    )
    from mofanerf_tpu.train.state import (
        Batch, create_train_state, make_optimizer, train_step,
    )
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.utils.metrics import to8b

    aabb_min, aabb_max = (-3.0,) * 3, (3.0,) * 3  # large cube verts at +-2.2

    # ---- 1. two-expression teacher (small cube = exp 0, large = exp 1)
    cube = lambda s: (
        np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                  [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                 np.float64) * s,
        np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5],
                  [0, 5, 1], [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3],
                  [3, 7, 4], [3, 4, 0]], np.int32),
    )
    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    render_identity(0, {0: cube(1.0), 1: cube(2.2)}, data_dir, res=args.res)
    ds = load_facescape_data(data_dir, [0], np.zeros((300, 50), np.float32),
                             testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    if args.quick:
        coarse, fine = FieldConfig(depth=4, width=32), FieldConfig(depth=4, width=64)
        n_samp, n_rand, dbatch, lrate = 16, 512, 2048, 1e-3
    elif args.flagship:
        # reference dims NEED the reference lr (flagship bistability —
        # artifacts/lm_anneal.json); fg-biased sampling converges this
        # scene by ~2000 iters (distill_synthetic --flagship measured it)
        coarse = FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16)
        fine = FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16)
        n_samp, n_rand, dbatch, lrate = 32, 1024, 8192, 5e-5
    else:
        coarse, fine = FieldConfig(depth=8, width=64), FieldConfig(depth=8, width=128)
        n_samp, n_rand, dbatch, lrate = 32, 1024, 8192, 1e-3
    spec = MoFaNeRF(
        coarse=coarse, fine=fine,
        render=RenderConfig(n_coarse=n_samp, n_importance=n_samp,
                            packet_size=4096, raw_noise_std=1.0),
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=lrate)
    tx = make_optimizer(lrate=lrate)
    step = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))
    rng = np.random.default_rng(0)
    uv = jnp.full((128, 128, 3), 0.5)
    imgs = {}

    def batch():
        ii = int(rng.choice(ds.i_split[0]))
        if ii not in imgs:
            imgs[ii] = imageio.imread(
                ds.image_paths[ii]).astype(np.float32)[..., :3] / 255.0
        t = imgs[ii]
        fr, fc = np.nonzero(t.sum(-1) > 0.05)
        nf = min(int(n_rand * 0.6), fr.shape[0])
        pick = (rng.integers(0, fr.shape[0], nf) if nf
                else np.empty(0, np.int64))
        coords = np.concatenate([
            np.stack([fr[pick], fc[pick]], -1).reshape(nf, 2),
            np.stack([rng.integers(0, H, n_rand - nf),
                      rng.integers(0, W, n_rand - nf)], -1)], 0)
        ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                             jnp.asarray(ds.poses[ii]))
        return Batch(ro, rd, jnp.asarray(t[coords[:, 0], coords[:, 1]]),
                     jnp.zeros(50), jnp.asarray(int(ds.exp_types[ii])), uv)

    t0 = time.time()
    for i in range(args.iters):
        state, m = step(state, batch(), jax.random.PRNGKey(i))
        if i % 500 == 0:
            print(f"[TEACHER] iter {i} loss {float(m['loss']):.4f} "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)", flush=True)
    params = state.params
    tex = encode_texture(params, spec, uv)
    shape = jnp.zeros(50)

    # ---- teacher reference renders on held-out poses, one per expression
    test_ids = [int(i) for i in ds.i_split[2][:2]]
    conds = {e: prepare_conditioning(params, spec, shape,
                                     exp_code_for(params, e), tex)
             for e in (0, 1)}
    teacher_imgs = {}
    for e in (0, 1):
        pose = jnp.asarray(ds.poses[test_ids[e]])[:3]
        teacher_imgs[e] = np.asarray(render_frame(
            params, spec, conds[e], H, W, jnp.asarray(K), pose)["rgb"])

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(-10.0 * np.log10(max(mse, 1e-10)), 2)

    def ssim(a, b):
        from mofanerf_tpu.utils.metrics import ssim as ssim_fn

        return round(float(ssim_fn(jnp.asarray(a), jnp.asarray(b))), 4)

    def area(img_acc):
        return float((np.asarray(img_acc) > 0.5).mean())

    serve_kw = dict(near=spec.render.near, far=spec.render.far, n_samples=32,
                    aabb_min=aabb_min, aabb_max=aabb_max,
                    packet_size=1024, hit_fraction=1.0)

    # ---- 2. ONE conditioned student across the bank
    dcfg = DistillConfig(cond_dim=spec.exp_dim, n_steps=args.distill_steps,
                         depth=args.student_depth, width=args.student_width,
                         batch=dbatch, aabb_min=aabb_min, aabb_max=aabb_max)
    t0 = time.time()
    st_c, cfg_c = distill_expressions(params, spec, shape, tex, dcfg,
                                      exp_ids=[0, 1], seed=0,
                                      log_every=args.distill_steps // 3)
    cond_secs = round(time.time() - t0, 1)

    results = {"teacher": f"{coarse.depth}x{coarse.width}+{fine.depth}x"
                          f"{fine.width} two-expression cube scene",
               "conditioned_student": f"{cfg_c.depth}x{cfg_c.width} "
                                      f"cond_dim={cfg_c.cond_dim}",
               "distill_steps": args.distill_steps,
               "cond_distill_secs": cond_secs,
               "per_expression": {}, "interpolation": {}}

    serve_frames = {}
    for e in (0, 1):
        code = student_code(params, shape, exp_code_for(params, e))
        pose = jnp.asarray(ds.poses[test_ids[e]])[:3]
        out = render_frame_serve(st_c.params, cfg_c, code, H, W,
                                 jnp.asarray(K), pose, **serve_kw)
        serve_frames[e] = out
        results["per_expression"][str(e)] = {
            "cond_psnr_vs_teacher_db": psnr(np.asarray(out["rgb"]),
                                            teacher_imgs[e]),
            "cond_ssim_vs_teacher": ssim(np.asarray(out["rgb"]),
                                         teacher_imgs[e]),
            "teacher_area": area(render_frame(
                params, spec, conds[e], H, W, jnp.asarray(K), pose)["acc"]),
            "cond_area": area(out["acc"]),
        }

    # ---- 3. unconditioned per-expression baseline (same per-exp budget)
    for e in (0, 1):
        ducfg = DistillConfig(n_steps=args.distill_steps // 2, batch=dbatch,
                              aabb_min=aabb_min, aabb_max=aabb_max)
        st_u, cfg_u = distill(params["fine"], spec.fine, conds[e].fine,
                              ducfg, seed=e)
        pose = jnp.asarray(ds.poses[test_ids[e]])[:3]
        out = render_frame_serve(st_u.params, cfg_u, st_u.cond, H, W,
                                 jnp.asarray(K), pose, **serve_kw)
        results["per_expression"][str(e)]["uncond_psnr_vs_teacher_db"] = psnr(
            np.asarray(out["rgb"]), teacher_imgs[e])

    # ---- 4. interpolation: midpoint code renders in-between geometry
    mid_raw = 0.5 * (exp_code_for(params, 0) + exp_code_for(params, 1))
    code_mid = student_code(params, shape, mid_raw)
    pose = jnp.asarray(ds.poses[test_ids[0]])[:3]
    out_mid = render_frame_serve(st_c.params, cfg_c, code_mid, H, W,
                                 jnp.asarray(K), pose, **serve_kw)
    a0 = area(render_frame_serve(st_c.params, cfg_c,
                                 student_code(params, shape,
                                              exp_code_for(params, 0)),
                                 H, W, jnp.asarray(K), pose, **serve_kw)["acc"])
    a1 = area(render_frame_serve(st_c.params, cfg_c,
                                 student_code(params, shape,
                                              exp_code_for(params, 1)),
                                 H, W, jnp.asarray(K), pose, **serve_kw)["acc"])
    am = area(out_mid["acc"])
    results["interpolation"] = {
        "area_exp0": a0, "area_mid": am, "area_exp1": a1,
        "monotone": bool(min(a0, a1) < am < max(a0, a1)),
    }

    os.makedirs(args.out, exist_ok=True)
    for e, fr in serve_frames.items():
        imageio.imwrite(os.path.join(args.out, f"cond_exp{e}.png"),
                        to8b(np.asarray(fr["rgb"])))
    imageio.imwrite(os.path.join(args.out, "cond_mid.png"),
                    to8b(np.asarray(out_mid["rgb"])))

    art = args.artifacts or os.path.join(args.out, "cond_student_quality.json")
    os.makedirs(os.path.dirname(os.path.abspath(art)), exist_ok=True)
    with open(art, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))

    pe = results["per_expression"]
    if not args.quick:  # quick mode = smoke; undertrained nets render mush
        assert results["interpolation"]["monotone"], "midpoint not in-between"
        for e in ("0", "1"):
            assert pe[e]["cond_psnr_vs_teacher_db"] > 18, pe
    print("CONDITIONED STUDENT OK")


if __name__ == "__main__":
    main()
