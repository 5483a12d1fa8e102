"""Distillation quality/throughput study: teacher -> student -> numbers.

End-to-end on synthetic data (no external downloads):
1. rasterize a multiview cube dataset, train a two-pass MoFaNeRF on it;
2. render held-out views with the trained teacher (the reference-parity
   two-pass path) — these are the serving path's quality target;
3. distill the conditioned fine field into per-avatar students
   (train/distill.py) at several capacities;
4. render the same views through the gather-free serving path
   (render/serve.py) at several sample counts, measure PSNR vs the
   teacher renders (and vs GT for context) plus packet throughput;
5. write artifacts/distill_quality.json — the table bench.py surfaces
   next to the headline throughput.

Usage: python examples/distill_synthetic.py [--iters 2000] [--out DIR]
       [--artifacts artifacts/distill_quality.json]
"""
from __future__ import annotations

import argparse
import json
import os
import time


AABB_MIN, AABB_MAX = (-2.2,) * 3, (2.2,) * 3  # cube verts at +-1.6


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_distill")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--distill_steps", type=int, default=3000)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--artifacts", default=None,
                   help="where to write the quality JSON (default <out>/distill_quality.json)")
    p.add_argument("--quick", action="store_true",
                   help="one tiny student, S=16 only (CI/CPU smoke)")
    p.add_argument("--flagship", action="store_true",
                   help="teacher at reference dims (8x256 coarse + 10x1024 "
                        "fine, bf16) so the occupancy-path numbers are "
                        "comparable to bench.py's")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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
    from mofanerf_tpu.render.serve import render_frame_serve, render_rays_bounded
    from mofanerf_tpu.train.distill import DistillConfig, distill
    from mofanerf_tpu.train.state import (
        Batch, create_train_state, make_optimizer, train_step,
    )
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.utils.metrics import ssim as ssim_fn, to8b

    # ---- 1. dataset + teacher training (same toy scene as train_synthetic)
    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    v = np.array([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ], np.float64) * 1.6
    f = np.array([
        [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
        [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
    ], np.int32)
    render_identity(0, {0: (v, f)}, data_dir, res=args.res)
    ds = load_facescape_data(data_dir, [0], np.zeros((300, 50), np.float32),
                             testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    if args.flagship:
        coarse = FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16)
        fine = FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16)
        teacher_desc = "8x256+10x1024 bf16 (reference dims)"
        # flagship width NEEDS the reference lr: at 5e-4 the field is
        # bistable (collapse/fog) — see artifacts/lm_anneal.json
        lrate = 5e-5
    else:
        coarse = FieldConfig(depth=8, width=args.width)
        fine = FieldConfig(depth=8, width=args.width * 2)
        teacher_desc = f"8x{args.width}+8x{args.width * 2}"
        lrate = 1e-3
    spec = MoFaNeRF(
        coarse=coarse, fine=fine,
        render=RenderConfig(n_coarse=32, n_importance=32, packet_size=4096,
                            raw_noise_std=1.0),
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=lrate)
    tx = make_optimizer(lrate=lrate)
    step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))

    rng = np.random.default_rng(0)
    uv = jnp.full((128, 128, 3), 0.5)
    images = {}

    def batch_for(i=0):
        img_i = int(rng.choice(ds.i_split[0]))
        if img_i not in images:
            img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
            images[img_i] = img[..., :3]
        target = images[img_i]
        obj_r, obj_c = np.nonzero(target.sum(-1) > 0.05)
        # anneal the object bias in (data/landmarks.py::anneal_lm_frac
        # rationale): full bias from step 0 risks the fog basin at large
        # widths
        n_obj = min(int(614 * min(1.0, i / 1000)), obj_r.shape[0])
        pick = rng.integers(0, obj_r.shape[0], n_obj) if n_obj else np.empty(0, int)
        obj_coords = np.stack([obj_r[pick], obj_c[pick]], -1)
        n_uni = 1024 - n_obj
        uni = np.stack([rng.integers(0, H, n_uni), rng.integers(0, W, n_uni)], -1)
        coords = np.concatenate([obj_coords, uni], 0)
        ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                             jnp.asarray(ds.poses[img_i]))
        return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                     jnp.zeros(50), jnp.asarray(0), uv)

    t0 = time.time()
    for i in range(args.iters):
        state, m = step_fn(state, batch_for(i), jax.random.PRNGKey(i))
        if i % 200 == 0:
            print(f"[TEACHER] iter {i} loss {float(m['loss']):.4f} "
                  f"psnr {float(m['psnr']):.2f} ({(i + 1) / (time.time() - t0):.1f} it/s)")

    tex = encode_texture(state.params, spec, uv)
    cond = prepare_conditioning(state.params, spec, jnp.zeros(50),
                                exp_code_for(state.params, 0), tex)

    # ---- 2. teacher renders on held-out views (jitted once, pose varies)
    test_ids = [int(i) for i in ds.i_split[2][:4]]
    Kj = jnp.asarray(K)
    teacher_frame = jax.jit(
        lambda p, c, pose: render_frame(p, spec, c, H, W, Kj, pose)["rgb"]
    )
    teacher_renders, gts = {}, {}
    for ti in test_ids:
        teacher_renders[ti] = np.asarray(
            teacher_frame(state.params, cond, jnp.asarray(ds.poses[ti][:3]))
        )
        gts[ti] = imageio.imread(ds.image_paths[ti]).astype(np.float32)[..., :3] / 255.0

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    def ssim(a, b):
        return float(ssim_fn(jnp.asarray(a), jnp.asarray(b)))

    teacher_vs_gt = float(np.mean([psnr(teacher_renders[t], gts[t]) for t in test_ids]))
    teacher_ssim_gt = float(np.mean([ssim(teacher_renders[t], gts[t])
                                     for t in test_ids]))
    print(f"[TEACHER] held-out PSNR vs GT: {teacher_vs_gt:.2f} dB over {len(test_ids)} views")

    # ---- 2b. teacher production path on a REAL trained-field grid:
    # build_proposal_grid from the trained COARSE field (the fine net is
    # unconstrained off the importance-sample distribution), then measure the
    # occupancy-culled path's quality (vs the two-pass render) and packet
    # throughput through actual scene geometry — the numbers a synthetic
    # random grid cannot give.
    from mofanerf_tpu.ops.occupancy import (
        build_proposal_grid, render_frame_fast, render_rays_occupancy,
    )
    from mofanerf_tpu.ops.rays import get_rays

    grid = build_proposal_grid(
        state.params, spec, cond, resolution=64,
        aabb_min=AABB_MIN, aabb_max=AABB_MAX, density_threshold=1.0,
    )
    occ_frac = float(jnp.mean(grid.occ))
    occ_quality = {}
    for keep in (16, 32):
        fast_frame = jax.jit(
            lambda p, c, pose, _k=keep: render_frame_fast(
                p, spec, c, grid, H, W, Kj, pose, s_probe=64, k_keep=_k,
                hit_fraction=1.0)["rgb"]
        )
        pv = float(np.mean([
            psnr(np.asarray(fast_frame(state.params, cond.fine,
                                       jnp.asarray(ds.poses[t][:3]))),
                 teacher_renders[t])
            for t in test_ids
        ]))
        # packet throughput through real geometry (rays of a test view)
        ro_f, rd_f = get_rays(H, W, Kj, jnp.asarray(ds.poses[test_ids[0]][:3]))
        reps = max(1, 8192 // (H * W) + 1)
        ro8 = jnp.tile(ro_f.reshape(-1, 3), (reps, 1))[:8192]
        rd8 = jnp.tile(rd_f.reshape(-1, 3), (reps, 1))[:8192]

        @jax.jit
        def occ_loop(o, d, _k=keep):
            def body(i, acc):
                out = render_rays_occupancy(
                    state.params["fine"], spec.fine, cond.fine, grid,
                    o + i * 1e-6, d, 8.0, 26.0, 64, _k)
                return acc + jnp.sum(out["rgb"])
            return jax.lax.fori_loop(0, 16, body, 0.0)

        float(occ_loop(ro8, rd8))
        t1 = time.perf_counter()
        float(occ_loop(ro8, rd8))
        occ_rays = 8192 / ((time.perf_counter() - t1) / 16)
        occ_quality[f"keep{keep}"] = {
            "psnr_vs_teacher_db": round(pv, 2),
            "rays_per_sec": round(occ_rays, 1),
        }
        print(f"[OCC keep={keep}] PSNR vs two-pass {pv:.2f} dB, "
              f"{occ_rays/1e3:.1f}k rays/s (real grid, occ {occ_frac:.3f})")

    # ---- 3/4. distill several students, render + measure
    students = {
        "mlp_128x4_mr8": DistillConfig(arch="mlp", depth=4, width=128, multires=8,
                                       n_steps=args.distill_steps,
                                       aabb_min=AABB_MIN, aabb_max=AABB_MAX),
        "mlp_192x6_mr8": DistillConfig(arch="mlp", depth=6, width=192, skip=3,
                                       multires=8, n_steps=args.distill_steps,
                                       aabb_min=AABB_MIN, aabb_max=AABB_MAX),
        "mlp_256x8_mr10": DistillConfig(arch="mlp", depth=8, width=256, skip=4,
                                        multires=10, n_steps=args.distill_steps,
                                        aabb_min=AABB_MIN, aabb_max=AABB_MAX),
    }
    sample_counts = (16, 32)
    if args.quick:
        students = {"mlp_32x3_mr6": DistillConfig(
            arch="mlp", depth=3, width=32, multires=6, batch=1024,
            n_steps=args.distill_steps, aabb_min=AABB_MIN, aabb_max=AABB_MAX)}
        sample_counts = (16,)
    rows = []
    os.makedirs(args.out, exist_ok=True)
    for name, dcfg in students.items():
        t0 = time.time()
        st, scfg = distill(state.params["fine"], spec.fine, cond.fine, dcfg,
                           seed=0, log_every=1000)
        distill_sec = time.time() - t0
        for S in sample_counts:
            serve_frame = jax.jit(
                lambda p, c, pose, _cfg=scfg, _s=S: render_frame_serve(
                    p, _cfg, c, H, W, Kj, pose, n_samples=_s,
                    aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                    packet_size=4096, hit_fraction=1.0,
                )["rgb"]
            )
            renders = {
                ti: np.asarray(serve_frame(st.params, st.cond,
                                           jnp.asarray(ds.poses[ti][:3])))
                for ti in test_ids
            }
            p_teacher = float(np.mean([psnr(renders[t], teacher_renders[t])
                                       for t in test_ids]))
            p_gt = float(np.mean([psnr(renders[t], gts[t]) for t in test_ids]))
            s_teacher = float(np.mean([ssim(renders[t], teacher_renders[t])
                                       for t in test_ids]))
            s_gt = float(np.mean([ssim(renders[t], gts[t]) for t in test_ids]))

            # packet throughput at production shapes
            n_rays = 8192
            rd = jax.random.normal(jax.random.PRNGKey(1), (n_rays, 3))
            rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            ro = jnp.zeros((n_rays, 3))

            @jax.jit
            def loop(o, d, _p=st.params, _c=st.cond, _cfg=scfg, _s=S):
                def body(i, acc):
                    out = render_rays_bounded(_p, _cfg, _c, o + i * 1e-6, d,
                                              8.0, 26.0, _s, AABB_MIN, AABB_MAX)
                    return acc + jnp.sum(out["rgb"])
                return jax.lax.fori_loop(0, 16, body, 0.0)

            float(loop(ro, rd))
            t1 = time.perf_counter()
            float(loop(ro, rd))
            rays_per_s = n_rays / ((time.perf_counter() - t1) / 16)

            rows.append({
                "student": name, "samples": S,
                "psnr_vs_teacher_db": round(p_teacher, 2),
                "psnr_vs_gt_db": round(p_gt, 2),
                "ssim_vs_teacher": round(s_teacher, 4),
                "ssim_vs_gt": round(s_gt, 4),
                "rays_per_sec": round(rays_per_s, 1),
                "distill_sec": round(distill_sec, 1),
            })
            print(f"[STUDENT {name} S={S}] PSNR vs teacher {p_teacher:.2f} dB, "
                  f"vs GT {p_gt:.2f} dB, {rays_per_s / 1e6:.2f}M rays/s")
            if S == sample_counts[-1]:
                imageio.imwrite(os.path.join(args.out, f"{name}.png"),
                                to8b(renders[test_ids[0]]))
    imageio.imwrite(os.path.join(args.out, "teacher.png"),
                    to8b(teacher_renders[test_ids[0]]))
    imageio.imwrite(os.path.join(args.out, "gt.png"), to8b(gts[test_ids[0]]))

    result = {
        "scene": f"synthetic cube {args.res}x{args.res}, teacher "
                 f"{teacher_desc}, {args.iters} iters",
        "teacher_psnr_vs_gt_db": round(teacher_vs_gt, 2),
        "teacher_ssim_vs_gt": round(teacher_ssim_gt, 4),
        "device": str(jax.devices()[0]),
        "occupancy_real_grid": {"occ_fraction": round(occ_frac, 4), **occ_quality},
        "students": rows,
    }
    art = args.artifacts or os.path.join(args.out, "distill_quality.json")
    os.makedirs(os.path.dirname(os.path.abspath(art)), exist_ok=True)
    with open(art, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
