"""Serve-quality breadth: distillation measured on structurally DISTINCT
scenes (VERDICT r2 #4).

Round 2's distillation quality rested on one convex cube — the friendliest
geometry for an AABB-bounded gather-free path. This study repeats the
teacher -> student -> serving pipeline on three structurally different
scenes and reports the PSNR + SSIM spread:

  shell    — thin anisotropic ellipsoid shell (faces are ~5%-occupancy
             shells; density concentrates on a curved 2D surface),
  concave  — torus + two offset spheres (multi-lobe, concavity, rays that
             enter/exit density repeatedly),
  face     — a procedural head from datagen/synthetic_faces (the actual
             workload geometry: nose/brow relief, eye/mouth indentations).

Per scene: train a toy two-pass teacher, render held-out views, distill
one per-avatar student (train/distill.py), render the same views through
the bounded serving path, measure PSNR+SSIM vs teacher and vs GT.

Writes artifacts/distill_scenes.json.

Usage: python examples/distill_scenes.py [--iters 2000] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sphere(n_lat=28, n_lon=40):
    """Unit sphere (dirs, faces) via the shared lat-long topology
    (datagen/synthetic_faces.py::_sphere_topology)."""
    from mofanerf_tpu.datagen.synthetic_faces import _sphere_topology

    dirs, faces, _ = _sphere_topology(n_lat, n_lon)
    return dirs, faces


def _torus(R=1.6, r=0.55, n_u=40, n_v=20):
    import numpy as np

    u = np.linspace(-np.pi, np.pi, n_u, endpoint=False)
    v = np.linspace(-np.pi, np.pi, n_v, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = r * np.sin(vv)
    z = (R + r * np.cos(vv)) * np.sin(uu)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)

    def vid(i, j):
        return (i % n_u) * n_v + (j % n_v)

    faces = []
    for i in range(n_u):
        for j in range(n_v):
            faces.append((vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)))
            faces.append((vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)))
    return verts, np.asarray(faces, dtype="int32")


def build_scenes():
    import numpy as np

    from mofanerf_tpu.datagen.synthetic_faces import face_mesh

    scenes = {}
    # thin anisotropic ellipsoid shell
    sv, sf = _sphere()
    scenes["shell"] = (sv * np.array([2.6, 1.6, 1.0]), sf, None)

    # concave multi-object: torus (tilted) + two spheres
    tv, tf = _torus()
    rot = np.array([[1, 0, 0], [0, 0.5, -np.sqrt(3) / 2],
                    [0, np.sqrt(3) / 2, 0.5]])
    tv = tv @ rot.T
    s1v, s1f = _sphere(14, 20)
    s2v, s2f = _sphere(14, 20)
    verts = np.concatenate([tv, s1v * 0.6 + [1.4, 1.1, 0.6],
                            s2v * 0.45 + [-1.3, -0.9, 0.9]])
    faces = np.concatenate([tf, s1f + len(tv), s2f + len(tv) + len(s1v)])
    scenes["concave"] = (verts, faces, None)

    # procedural face (the real workload geometry + albedo)
    p = np.array([0.4, -0.3, 0.2, 0.8, -0.5, 0.6, 0.1, -0.2, 0.7, 0.3])
    fv, ff, falb = face_mesh(p, expression=1)
    scenes["face"] = (fv, ff, falb)
    return scenes


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_distill_scenes")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--teacher_lr", type=float, default=5e-4,
                   help="teacher lr; 1e-3 measurably collapses 2 of 3 "
                        "scenes (round-3 artifact), 5e-4 + softplus sigma "
                        "holds all three")
    p.add_argument("--distill_steps", type=int, default=3000)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--artifacts", default="artifacts/distill_scenes.json")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.iters, args.distill_steps, args.width = 150, 150, 24

    import numpy as np
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from mofanerf_tpu.data.facescape import load_facescape_data
    from mofanerf_tpu.datagen.multiview import render_identity
    from mofanerf_tpu.models.field import FieldConfig
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, encode_texture, exp_code_for,
        prepare_conditioning, render_frame,
    )
    from mofanerf_tpu.render.serve import render_frame_serve
    from mofanerf_tpu.train.distill import DistillConfig, distill
    from mofanerf_tpu.train.state import (
        Batch, create_train_state, make_optimizer, train_step,
    )
    from mofanerf_tpu.utils.metrics import img2mse, mse2psnr, ssim as ssim_fn, to8b

    def psnr(a, b):
        mse = float(img2mse(jnp.asarray(a), jnp.asarray(b)))
        return float(mse2psnr(jnp.asarray(max(mse, 1e-10))))  # cap at 100 dB

    aabb_min, aabb_max = (-3.0,) * 3, (3.0,) * 3
    scene_rows = []
    os.makedirs(args.out, exist_ok=True)

    for sid, (name, (verts, faces, albedo)) in enumerate(build_scenes().items()):
        print(f"\n=== scene {name}: {len(verts)} verts {len(faces)} faces ===")
        data_dir = os.path.join(args.out, f"data_{name}{args.res}")
        os.makedirs(data_dir, exist_ok=True)
        render_identity(0, {0: (verts, faces, albedo)}, data_dir, res=args.res,
                        view_stride=4 if args.quick else 1)
        ds = load_facescape_data(data_dir, [0], np.zeros((300, 50), np.float32),
                                 testskip=1)
        H, W, focal = ds.hwf
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                     np.float32)
        Kj = jnp.asarray(K)

        # Two collapse defenses, both measured (round 2/3):
        # - white_bkgd: with black backgrounds an empty (or black-fog) field
        #   matches most pixels for free and thin/concave scenes collapse
        #   into that basin (teacher ~7.5 dB, "student matches empty teacher
        #   at 100 dB" degenerate rows).
        # - softplus sigma: relu's dead zone is an absorbing state — once
        #   raw sigma goes negative everywhere the density gradient is
        #   exactly zero and the field can never recover
        #   (artifacts/lm_anneal.json). softplus keeps the recovery
        #   gradient alive, so a transiently-emptied scene climbs back out.
        spec = MoFaNeRF(
            coarse=FieldConfig(depth=8, width=args.width),
            fine=FieldConfig(depth=8, width=args.width * 2),
            render=RenderConfig(n_coarse=32, n_importance=32,
                                packet_size=4096, raw_noise_std=1.0,
                                white_bkgd=True,
                                sigma_activation="softplus"),
            uv_size=128,
        )

        rng = np.random.default_rng(sid)
        uv = jnp.full((128, 128, 3), 0.5)
        images = {}

        def load_white(path):
            """RGBA png -> (rgb over white, fg mask)."""
            img = np.asarray(imageio.imread(path), np.float32) / 255.0
            if img.shape[-1] == 4:
                a = img[..., 3:]
                return img[..., :3] * a + (1.0 - a), img[..., 3] > 0.02
            return img[..., :3], img[..., :3].sum(-1) > 0.05

        def batch_for(i):
            img_i = int(rng.choice(ds.i_split[0]))
            if img_i not in images:
                images[img_i] = load_white(ds.image_paths[img_i])
            target, fg_mask = images[img_i]
            obj_r, obj_c = np.nonzero(fg_mask)
            n_obj = min(int(614 * min(1.0, i / 1000)), obj_r.shape[0])
            pick = (rng.integers(0, obj_r.shape[0], n_obj) if n_obj
                    else np.empty(0, int))
            coords = np.concatenate([
                np.stack([obj_r[pick], obj_c[pick]], -1),
                np.stack([rng.integers(0, H, 1024 - n_obj),
                          rng.integers(0, W, 1024 - n_obj)], -1),
            ], 0)
            ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), Kj,
                                 jnp.asarray(ds.poses[img_i]))
            return Batch(ro, rd,
                         jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                         jnp.zeros(50), jnp.asarray(0), uv)

        test_ids = [int(i) for i in ds.i_split[2][:4]]
        teacher_frame = jax.jit(
            lambda p, c, pose, _spec=spec: render_frame(
                p, _spec, c, H, W, Kj, pose)["rgb"])
        gts = {ti: load_white(ds.image_paths[ti])[0] for ti in test_ids}

        def train_teacher(lr: float, seed: int, iters: int):
            state = create_train_state(jax.random.PRNGKey(seed), spec,
                                       lrate=lr)
            tx = make_optimizer(lrate=lr)
            step_fn = jax.jit(lambda s, b, k, _spec=spec, _tx=tx:
                              train_step(s, b, k, _spec, _tx))
            t0 = time.time()
            for i in range(iters):
                state, m = step_fn(state, batch_for(i),
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(seed), i))
                if i % max(1, iters // 5) == 0:
                    print(f"[{name}] iter {i} psnr {float(m['psnr']):.2f} "
                          f"({(i + 1) / (time.time() - t0):.1f} it/s)")
            tex = encode_texture(state.params, spec, uv)
            cond = prepare_conditioning(state.params, spec, jnp.zeros(50),
                                        exp_code_for(state.params, 0), tex)
            t_renders = {ti: np.asarray(teacher_frame(
                state.params, cond, jnp.asarray(ds.poses[ti][:3])))
                for ti in test_ids}
            gt_psnr = float(np.mean([psnr(t_renders[t], gts[t])
                                     for t in test_ids]))
            return state, cond, t_renders, gt_psnr

        # Convergence gate (VERDICT r3 weak #1): a teacher below the bar is
        # a FAILED teacher — distilling it produces a vacuous "student
        # matches an empty field" row. Retry on a schedule that pairs a
        # gentler lr with MORE iterations (measured on the concave scene:
        # lr/4 reached 19.7 dB in the base budget and was still climbing —
        # slower lrs need longer to clear the same bar), and fail the study
        # loudly if every attempt stays under the gate.
        gate_db = 20.0 if not args.quick else 8.0
        schedule = [(args.teacher_lr, sid, args.iters),
                    (args.teacher_lr / 4, sid + 100, 2 * args.iters),
                    (args.teacher_lr / 8, sid + 200, 3 * args.iters)]
        attempts = []
        for lr_a, seed_a, iters_a in schedule:
            state, cond, t_renders, teacher_gt_psnr = train_teacher(
                lr_a, seed=seed_a, iters=iters_a)
            attempts.append({"lr": lr_a, "seed": seed_a, "iters": iters_a,
                             "teacher_psnr_vs_gt_db":
                                 round(teacher_gt_psnr, 2)})
            if teacher_gt_psnr >= gate_db:
                break
            print(f"[{name}] teacher FAILED gate ({teacher_gt_psnr:.1f} < "
                  f"{gate_db} dB) — retrying")
        if teacher_gt_psnr < gate_db:
            raise RuntimeError(
                f"scene {name!r}: teacher failed to converge in "
                f"{len(attempts)} attempts ({attempts}); refusing to "
                f"distill a collapsed field")
        teacher_gt_ssim = float(np.mean([
            float(ssim_fn(jnp.asarray(t_renders[t]), jnp.asarray(gts[t])))
            for t in test_ids]))

        dcfg = DistillConfig(
            arch="mlp", depth=4, width=128, multires=8,
            n_steps=args.distill_steps, aabb_min=aabb_min, aabb_max=aabb_max,
            teacher_sigma_activation="softplus",
        ) if not args.quick else DistillConfig(
            arch="mlp", depth=3, width=32, multires=6, batch=1024,
            n_steps=args.distill_steps, aabb_min=aabb_min, aabb_max=aabb_max,
            teacher_sigma_activation="softplus",
        )
        t0 = time.time()
        st, scfg = distill(state.params["fine"], spec.fine, cond.fine, dcfg,
                           seed=0, log_every=max(1, args.distill_steps // 3))
        distill_sec = round(time.time() - t0, 1)

        serve_frame = jax.jit(
            lambda p, c, pose, _cfg=scfg: render_frame_serve(
                p, _cfg, c, H, W, Kj, pose, n_samples=args.n_samples,
                aabb_min=aabb_min, aabb_max=aabb_max, white_bkgd=True,
                packet_size=4096, hit_fraction=1.0)["rgb"])
        s_renders = {ti: np.asarray(serve_frame(
            st.params, st.cond, jnp.asarray(ds.poses[ti][:3])))
            for ti in test_ids}

        row = {
            "scene": name,
            "teacher_psnr_vs_gt_db": round(teacher_gt_psnr, 2),
            "teacher_ssim_vs_gt": round(teacher_gt_ssim, 4),
            "student_psnr_vs_teacher_db": round(float(np.mean(
                [psnr(s_renders[t], t_renders[t]) for t in test_ids])), 2),
            "student_ssim_vs_teacher": round(float(np.mean(
                [float(ssim_fn(jnp.asarray(s_renders[t]),
                               jnp.asarray(t_renders[t])))
                 for t in test_ids])), 4),
            "student_psnr_vs_gt_db": round(float(np.mean(
                [psnr(s_renders[t], gts[t]) for t in test_ids])), 2),
            "student_ssim_vs_gt": round(float(np.mean(
                [float(ssim_fn(jnp.asarray(s_renders[t]), jnp.asarray(gts[t])))
                 for t in test_ids])), 4),
            "distill_sec": distill_sec,
            "n_verts": int(len(verts)), "n_faces": int(len(faces)),
            "teacher_attempts": attempts,
        }
        scene_rows.append(row)
        print(f"[{name}] student vs teacher "
              f"{row['student_psnr_vs_teacher_db']} dB / "
              f"SSIM {row['student_ssim_vs_teacher']}")
        imageio.imwrite(os.path.join(args.out, f"{name}_teacher.png"),
                        to8b(t_renders[test_ids[0]]))
        imageio.imwrite(os.path.join(args.out, f"{name}_student.png"),
                        to8b(s_renders[test_ids[0]]))

    vs_t = [r["student_psnr_vs_teacher_db"] for r in scene_rows]
    result = {
        "study": "per-avatar distillation quality across structurally "
                 "distinct scenes (thin shell / concave multi-object / "
                 "procedural face)",
        "teacher": f"8x{args.width}+8x{args.width * 2}, {args.iters} iters, "
                   f"{args.res}^2",
        "student": ("mlp 4x128 mr8" if not args.quick else "mlp 3x32 mr6")
                   + f", {args.distill_steps} steps, "
                     f"{args.n_samples} bounded samples",
        "device": str(jax.devices()[0]),
        "white_bkgd": True,
        "sigma_activation": "softplus",
        "teacher_lr": args.teacher_lr,
        "teacher_gate_db": 20.0 if not args.quick else 8.0,
        "scenes": scene_rows,
        "psnr_vs_teacher_spread_db": [round(min(vs_t), 2), round(max(vs_t), 2)],
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.artifacts)), exist_ok=True)
    with open(args.artifacts, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
