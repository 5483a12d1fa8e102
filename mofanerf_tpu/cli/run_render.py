"""Orbit / testset rendering CLI.

Covers the reference's render-only paths: `render_path` over the spherical
orbit (tools/load_facescape.py:87-88, run_train.py i_video hook) for a given
identity + expression, writing frames and an mp4 when imageio-ffmpeg is
available.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.config import load_config
from mofanerf_tpu.data.facescape import read_image, load_shape_codes
from mofanerf_tpu.ops.rays import pose_spherical
from mofanerf_tpu.render.renderer import (
    prepare_conditioning,
    render_path,
    encode_texture,
    exp_code_for,
)
from mofanerf_tpu.train.checkpoint import latest_step, restore_checkpoint
from mofanerf_tpu.train.state import create_train_state
from mofanerf_tpu.utils.metrics import to8b


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--person", type=int, default=0)
    p.add_argument("--expression", type=int, default=0)
    p.add_argument("--n_views", type=int, default=40)
    p.add_argument("--render_factor", type=int, default=2)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--fast", action="store_true",
                   help="occupancy-culled rendering (builds a density grid once)")
    p.add_argument("--distill", action="store_true",
                   help="serving path: distill a per-avatar student once "
                        "(~10-30 s on TPU), then render the orbit through "
                        "the gather-free bounded renderer (fused Pallas "
                        "kernel on TPU) — the fastest path")
    p.add_argument("--distill_cond", action="store_true",
                   help="expression rigging at serving speed: distill ONE "
                        "code-conditioned student over the whole expression "
                        "bank, then render the orbit while morphing through "
                        "--rig_expressions (the reference's "
                        "rendering_modulation, run_fit.py:379-431, at "
                        "serving-path throughput)")
    p.add_argument("--rig_expressions", default="9,14,2,16,17",
                   help="comma-separated bank slots the rig sweeps through "
                        "(reference default list, run_fit.py:388)")
    p.add_argument("--distill_avatars", default=None,
                   help="comma-separated person ids: distill ONE student "
                        "across those identities ([shape ; expression] "
                        "conditioning) and render an orbit that morphs "
                        "between them — the serving-speed analog of the "
                        "reference's shape/texture-swap demo "
                        "(run_fit.py:405-431)")
    p.add_argument("--distill_steps", type=int, default=2000)
    p.add_argument("--student_path", default=None,
                   help="deployable student artifact (.npz): load it instead "
                        "of distilling when it exists; otherwise distill "
                        "once and save it there (serve-from-file)")
    p.add_argument("--n_samples", type=int, default=32)
    args, rest = p.parse_known_args(argv)
    cfg = load_config(rest)

    import imageio.v2 as imageio

    spec = cfg.model_spec()
    state = create_train_state(jax.random.PRNGKey(0), spec)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded checkpoint (step {int(state.step)})")
    else:
        print("WARNING: rendering an untrained model")
    params = state.params

    shape = jnp.zeros(spec.shape_dim)
    if os.path.exists(cfg.shape_codes_path):
        shape = jnp.asarray(load_shape_codes(cfg.shape_codes_path)[args.person])
    tex = jnp.zeros(spec.tex_dim)
    uv_path = os.path.join(cfg.uvdir, str(args.person), "1_neutral.jpg")
    if os.path.exists(uv_path):
        tex = encode_texture(
            params, spec, jnp.asarray(read_image(uv_path, is_uvmap=True, uv_size=spec.uv_size))
        )

    cond = prepare_conditioning(params, spec, shape, exp_code_for(params, args.expression), tex)
    poses = np.stack(
        [pose_spherical(a, 0.0, 16.0) for a in np.linspace(-180, 180, args.n_views + 1)[:-1]]
    )
    if args.distill or args.distill_cond or args.distill_avatars:
        from mofanerf_tpu.ops.bounds import DEFAULT_AABB_MAX, DEFAULT_AABB_MIN
        from mofanerf_tpu.render.serve import render_frame_serve
        from mofanerf_tpu.train.distill import (
            DistillConfig,
            StudentState,
            avatar_code,
            distill,
            distill_avatars,
            distill_expressions,
            load_student,
            save_student,
            student_code,
        )

        def person_codes(pid):
            s = jnp.zeros(spec.shape_dim)
            if os.path.exists(cfg.shape_codes_path):
                s = jnp.asarray(load_shape_codes(cfg.shape_codes_path)[pid])
            t = jnp.zeros(spec.tex_dim)
            uvp = os.path.join(cfg.uvdir, str(pid), "1_neutral.jpg")
            if os.path.exists(uvp):
                t = encode_texture(params, spec, jnp.asarray(
                    read_image(uvp, is_uvmap=True, uv_size=spec.uv_size)))
            return s, t

        avatar_ids = ([int(s) for s in args.distill_avatars.split(",")
                       if s.strip()]
                      if args.distill_avatars else None)
        if args.distill_avatars and not avatar_ids:
            raise SystemExit(
                f"--distill_avatars={args.distill_avatars!r} parses to an "
                "empty list — pass comma-separated person ids"
            )

        # tighten the sampling box from the training-maintained occupancy
        # grid when available — fewer wasted samples per ray
        aabb_min, aabb_max = DEFAULT_AABB_MIN, DEFAULT_AABB_MAX
        grid_path = os.path.join(ckpt_dir, "occupancy_grid.npz")
        if os.path.exists(grid_path):
            from mofanerf_tpu.ops.occupancy import grid_aabb, load_grid

            g, _ = load_grid(grid_path)
            aabb_min, aabb_max = grid_aabb(g)
            print(f"serving AABB from maintained grid: {aabb_min} .. {aabb_max}")

        near, far = spec.render.near, spec.render.far
        dcfg_kw = dict(n_steps=args.distill_steps,
                       near=near, far=far,
                       aabb_min=aabb_min, aabb_max=aabb_max,
                       teacher_sigma_activation=spec.render.sigma_activation)
        if args.student_path and os.path.exists(args.student_path):
            sparams, scfg, prov = load_student(
                args.student_path, with_provenance=True)
            st = StudentState(sparams, None, None, jnp.asarray(0))
            print(f"loaded student artifact: {args.student_path}")
            # an avatar artifact carries its covered ids — adopt them before
            # the cond_dim checks so `--distill --student_path av.npz` serves
            # the artifact without re-typing --distill_avatars
            if (prov and prov.get("avatar_ids") is not None
                    and avatar_ids is None):
                avatar_ids = [int(v) for v in prov["avatar_ids"]]
                print(f"avatar ids from artifact: {avatar_ids}")
            if args.distill_cond and scfg.cond_dim != spec.exp_dim:
                raise SystemExit(
                    "--distill_cond rig needs an expression-conditioned "
                    f"student (cond_dim={spec.exp_dim}) but "
                    f"{args.student_path} has cond_dim={scfg.cond_dim}"
                )
            if avatar_ids and scfg.cond_dim != spec.shape_dim + spec.exp_dim:
                raise SystemExit(
                    "--distill_avatars needs a [shape ; exp]-conditioned "
                    f"student (cond_dim={spec.shape_dim + spec.exp_dim}) but "
                    f"{args.student_path} has cond_dim={scfg.cond_dim}"
                )
            if (not args.distill_cond and not avatar_ids
                    and scfg.cond_dim not in (0, spec.exp_dim)):
                raise SystemExit(
                    f"artifact {args.student_path} has cond_dim="
                    f"{scfg.cond_dim}, which matches neither an "
                    f"unconditioned (0) nor an expression-conditioned "
                    f"({spec.exp_dim}) student — use --distill_avatars for "
                    "[shape ; exp]-conditioned artifacts"
                )
            if prov:
                # a student is untrained outside its distillation box —
                # the artifact's recorded bounds override anything the
                # current environment derives (ADVICE r2: AABB mismatch
                # silently renders garbage density)
                aabb_min = tuple(prov.get("aabb_min", aabb_min))
                aabb_max = tuple(prov.get("aabb_max", aabb_max))
                near = float(prov.get("near", near))
                far = float(prov.get("far", far))
                print(f"serving AABB from artifact: {aabb_min} .. {aabb_max}")
                prov_person = prov.get("person")
                if prov_person is not None and int(prov_person) != args.person:
                    raise SystemExit(
                        f"artifact {args.student_path} was distilled for "
                        f"person {prov_person}, but --person={args.person} "
                        "was requested — the student's weights encode that "
                        "identity; re-distill (different --student_path) or "
                        f"pass --person {prov_person}"
                    )
                prov_avatars = prov.get("avatar_ids")
                if (prov_avatars is not None and avatar_ids is not None
                        and [int(v) for v in prov_avatars] != avatar_ids):
                    raise SystemExit(
                        f"artifact {args.student_path} covers avatars "
                        f"{prov_avatars}, but --distill_avatars="
                        f"{avatar_ids} was requested"
                    )
                # an expression-conditioned student (cond_dim == exp_dim)
                # takes the expression as a runtime code; anything else was
                # distilled AT prov['expression'] and is untrained elsewhere
                prov_exp = prov.get("expression")
                if (prov_exp is not None
                        and getattr(scfg, "cond_dim", 0) != spec.exp_dim
                        and int(prov_exp) != args.expression):
                    raise SystemExit(
                        f"artifact {args.student_path} was distilled at "
                        f"expression {prov_exp}, but --expression="
                        f"{args.expression} was requested — the student is "
                        "untrained there; re-distill, or pass --expression "
                        f"{prov_exp}"
                    )
        elif avatar_ids:
            avs = [person_codes(pid) for pid in avatar_ids]
            st, scfg = distill_avatars(
                params, spec, avs,
                DistillConfig(cond_dim=spec.shape_dim + spec.exp_dim,
                              **dcfg_kw),
                exp_ids=[args.expression],
                log_every=max(1, args.distill_steps // 4),
            )
        elif args.distill_cond:
            st, scfg = distill_expressions(
                params, spec, shape, tex,
                DistillConfig(cond_dim=spec.exp_dim, **dcfg_kw),
                log_every=max(1, args.distill_steps // 4),
            )
        else:
            st, scfg = distill(
                params["fine"], spec.fine, cond.fine,
                DistillConfig(**dcfg_kw),
                log_every=max(1, args.distill_steps // 4),
            )
        if args.student_path and not os.path.exists(args.student_path):
            from mofanerf_tpu.train.distill import distill_provenance

            dcfg_used = DistillConfig(
                cond_dim=getattr(scfg, "cond_dim", 0), **dcfg_kw)
            prov = distill_provenance(
                dcfg_used,
                person=None if avatar_ids else args.person,
                expression=args.expression,
                avatar_ids=avatar_ids,
            )
            save_student(args.student_path, st.params, scfg, provenance=prov)
            print(f"saved student artifact: {args.student_path}")
        rf = max(1, args.render_factor)
        H = W = 512 // rf
        Kr = jnp.asarray(
            np.array([[1200.0 / rf, 0, W / 2], [0, 1200.0 / rf, H / 2], [0, 0, 1]])
        )
        fused = jax.default_backend() == "tpu"
        pkt = min(16384, max(256, (H * W) // 4 // 256 * 256))
        frame = jax.jit(lambda pose, c: render_frame_serve(
            st.params, scfg, c, H, W, Kr, pose,
            near=near, far=far,
            n_samples=args.n_samples, packet_size=pkt,
            aabb_min=aabb_min, aabb_max=aabb_max,
            white_bkgd=spec.render.white_bkgd,
            hit_fraction=1.0, fused=fused,
        )["rgb"])
        if avatar_ids:
            # morph the shape code between the avatars across the orbit
            # (expression fixed) — identity morphing at serving throughput
            shapes = [person_codes(pid)[0] for pid in avatar_ids]
            raw_e = exp_code_for(params, args.expression)
            n_f = len(poses)
            codes = []
            for fidx in range(n_f):
                t = fidx / max(1, n_f - 1) * (len(shapes) - 1)
                i0 = min(int(t), max(0, len(shapes) - 2))
                a = t - i0
                s_t = ((1.0 - a) * shapes[i0]
                       + a * shapes[min(i0 + 1, len(shapes) - 1)])
                codes.append(avatar_code(params, s_t, raw_e))
            rgbs = np.stack([
                np.asarray(frame(jnp.asarray(p_)[:3], c))
                for p_, c in zip(poses, codes)
            ])
        elif args.distill_cond:
            # morph the raw expression latent through the rig list across
            # the orbit, ISM-modulate per frame — ONE compiled frame fn,
            # code is a traced argument (zero recompiles)
            rig = [int(s) for s in args.rig_expressions.split(",") if s.strip()]
            if not rig:
                raise SystemExit(
                    f"--rig_expressions={args.rig_expressions!r} parses to an "
                    "empty list — pass comma-separated bank slot indices"
                )
            n_f = len(poses)
            codes = []
            for fidx in range(n_f):
                t = fidx / max(1, n_f - 1) * (len(rig) - 1)
                i0 = min(int(t), max(0, len(rig) - 2))
                a = t - i0
                raw = ((1.0 - a) * exp_code_for(params, rig[i0])
                       + a * exp_code_for(params, rig[min(i0 + 1, len(rig) - 1)]))
                codes.append(student_code(params, shape, raw))
            rgbs = np.stack([
                np.asarray(frame(jnp.asarray(p_)[:3], c))
                for p_, c in zip(poses, codes)
            ])
        else:
            # a conditioned student (e.g. a loaded artifact) renders the
            # requested --expression; unconditioned students carry no code
            if getattr(scfg, "cond_dim", 0) > 0:
                code0 = student_code(params, shape,
                                     exp_code_for(params, args.expression))
            else:
                code0 = st.cond
            rgbs = np.stack([
                np.asarray(frame(jnp.asarray(p_)[:3], code0)) for p_ in poses
            ])
    elif args.fast:
        from mofanerf_tpu.ops.occupancy import (
            build_proposal_grid,
            load_grid,
            render_frame_fast,
        )

        # prefer the grid maintained during training (train/loop.py saves it
        # beside the checkpoints) — no manual export step needed; fall back
        # to probing a fresh per-avatar grid.
        grid_path = os.path.join(ckpt_dir, "occupancy_grid.npz")
        grid = None
        if os.path.exists(grid_path):
            grid, _ = load_grid(grid_path)
            occ_frac = float(jnp.mean(grid.occ))
            if occ_frac > 0.5:
                # grids maintained before the proposal-grid fix probed the
                # FINE field, which can read as fog through the whole box
                # (ops/occupancy.py build_proposal_grid) — a saturated grid
                # means no culling and, worse, band-respaced sampling of
                # unconstrained fine-field regions. Re-probe instead.
                print(f"maintained grid {grid_path} is {occ_frac:.0%} "
                      "occupied (stale fine-probed?) — re-probing the "
                      "coarse field")
                grid = None
            else:
                print(f"using training-maintained occupancy grid: {grid_path}")
        if grid is None:
            grid = build_proposal_grid(params, spec, cond)
        rf = max(1, args.render_factor)
        H = W = 512 // rf
        Kr = jnp.asarray(
            np.array([[1200.0 / rf, 0, W / 2], [0, 1200.0 / rf, H / 2], [0, 0, 1]])
        )
        rgbs = np.stack([
            np.asarray(render_frame_fast(
                params, spec, cond.fine, grid, H, W, Kr, jnp.asarray(p_)[:3]
            )["rgb"])
            for p_ in poses
        ])
    else:
        rgbs, _ = render_path(
            params, spec, cond, poses, (512, 512, 1200.0), render_factor=args.render_factor
        )

    os.makedirs(args.out_dir, exist_ok=True)
    for i, rgb in enumerate(rgbs):
        imageio.imwrite(os.path.join(args.out_dir, f"{i:03d}.png"), to8b(rgb))
    try:
        imageio.mimwrite(
            os.path.join(args.out_dir, "orbit.mp4"), to8b(rgbs), fps=20, quality=8
        )
        print(f"wrote {len(rgbs)} frames + orbit.mp4 to {args.out_dir}")
    except Exception as e:  # ffmpeg not available
        print(f"wrote {len(rgbs)} frames (no video: {e})")


if __name__ == "__main__":
    main()
