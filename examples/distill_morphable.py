"""Multi-avatar student study: ONE distilled student, several identities.

The serving path distills per avatar; distill_avatars amortizes further —
one student conditioned on [shape ; modulated-expression] serves every
(identity, expression) combination at unchanged throughput (the code folds
to biases; same fused kernel). This study validates identity control on
the two-identity synthetic scene (cube vs octahedron, the
examples/morphable_synthetic.py setup):

1. train one teacher on both identities with distinct shape codes;
2. distill ONE avatar-conditioned student across both;
3. per identity: PSNR of the served render vs the teacher's two-pass
   render with the SAME identity (own) and with the OTHER identity's
   teacher render (cross) — own must beat cross by a clear margin, or the
   code is being ignored;
4. write artifacts JSON.

Usage: python examples/distill_morphable.py [--iters 3000] [--cpu] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_distill_morph")
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--distill_steps", type=int, default=9000)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--artifacts", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true", help="CI/CPU smoke")
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
        DistillConfig, avatar_code, distill_avatars,
    )
    from mofanerf_tpu.train.state import (
        Batch, create_train_state, make_optimizer, train_step,
    )
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.utils.metrics import to8b

    aabb_min, aabb_max = (-3.0,) * 3, (3.0,) * 3

    # ---- two identities: cube vs octahedron, distinct shape codes + UVs
    cube_v = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                       [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                      np.float64) * 1.8
    cube_f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5],
                       [0, 5, 1], [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3],
                       [3, 7, 4], [3, 4, 0]], np.int32)
    octa_v = np.array([[2.2, 0, 0], [-2.2, 0, 0], [0, 2.2, 0], [0, -2.2, 0],
                       [0, 0, 2.2], [0, 0, -2.2]], np.float64)
    octa_f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                       [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    render_identity(0, {0: (cube_v, cube_f)}, data_dir, res=args.res)
    render_identity(1, {0: (octa_v, octa_f)}, data_dir, res=args.res)
    shape_codes = np.zeros((300, 50), np.float32)
    shape_codes[0, 0] = 1.0
    shape_codes[1, 1] = 1.0
    ds = load_facescape_data(data_dir, [0, 1], shape_codes, testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    if args.quick:
        coarse, fine = FieldConfig(depth=4, width=32), FieldConfig(depth=4, width=64)
        n_samp, n_rand, dbatch = 16, 512, 2048
    else:
        coarse, fine = FieldConfig(depth=8, width=64), FieldConfig(depth=8, width=128)
        n_samp, n_rand, dbatch = 32, 1024, 8192
    spec = MoFaNeRF(
        coarse=coarse, fine=fine,
        render=RenderConfig(n_coarse=n_samp, n_importance=n_samp,
                            packet_size=4096, raw_noise_std=1.0),
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=1e-3)
    tx = make_optimizer(lrate=1e-3)
    step = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))
    rng = np.random.default_rng(0)
    # distinct flat textures per identity so appearance follows the code too
    uvs = {0: jnp.full((128, 128, 3), 0.7),
           1: jnp.tile(jnp.asarray([0.2, 0.5, 0.8]), (128, 128, 1))}
    imgs = {}

    def batch():
        ii = int(rng.choice(ds.i_split[0]))
        if ii not in imgs:
            imgs[ii] = imageio.imread(
                ds.image_paths[ii]).astype(np.float32)[..., :3] / 255.0
        t = imgs[ii]
        pid = int(ds.id_codes[ii])
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
                     jnp.asarray(ds.shape_codes[ii]),
                     jnp.asarray(int(ds.exp_types[ii])), uvs[pid])

    t0 = time.time()
    for i in range(args.iters):
        state, m = step(state, batch(), jax.random.PRNGKey(i))
        if i % 500 == 0:
            print(f"[TEACHER] iter {i} loss {float(m['loss']):.4f} "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)", flush=True)
    params = state.params

    # ---- teacher reference renders per identity (same test pose)
    test_idx = {int(ds.id_codes[i]): int(i) for i in ds.i_split[2]}
    pose = jnp.asarray(ds.poses[test_idx[0]])[:3]
    teachers = {}
    avatars = []
    for pid in (0, 1):
        shape = jnp.asarray(shape_codes[pid])
        tex = encode_texture(params, spec, uvs[pid])
        avatars.append((shape, tex))
        cond = prepare_conditioning(params, spec, shape,
                                    exp_code_for(params, 0), tex)
        teachers[pid] = np.asarray(render_frame(
            params, spec, cond, H, W, jnp.asarray(K), pose)["rgb"])

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(-10.0 * np.log10(max(mse, 1e-10)), 2)

    def ssim(a, b):
        from mofanerf_tpu.utils.metrics import ssim as ssim_fn

        return round(float(ssim_fn(jnp.asarray(a), jnp.asarray(b))), 4)

    # ---- ONE student across both avatars
    dcfg = DistillConfig(cond_dim=spec.shape_dim + spec.exp_dim,
                         n_steps=args.distill_steps, batch=dbatch,
                         aabb_min=aabb_min, aabb_max=aabb_max)
    t0 = time.time()
    st, scfg = distill_avatars(params, spec, avatars, dcfg, exp_ids=[0],
                               seed=0,
                               log_every=max(1, args.distill_steps // 3))
    secs = round(time.time() - t0, 1)

    serve_kw = dict(near=spec.render.near, far=spec.render.far, n_samples=32,
                    aabb_min=aabb_min, aabb_max=aabb_max,
                    packet_size=1024, hit_fraction=1.0)
    results = {"teacher": f"{coarse.depth}x{coarse.width}+{fine.depth}x"
                          f"{fine.width} two-identity scene (cube/octa)",
               "student": f"{scfg.depth}x{scfg.width} cond_dim={scfg.cond_dim}",
               "distill_steps": args.distill_steps, "distill_secs": secs,
               "per_identity": {}}
    os.makedirs(args.out, exist_ok=True)
    renders = {}
    for pid in (0, 1):
        code = avatar_code(params, avatars[pid][0], exp_code_for(params, 0))
        out = render_frame_serve(st.params, scfg, code, H, W, jnp.asarray(K),
                                 pose, **serve_kw)
        renders[pid] = np.asarray(out["rgb"])
        imageio.imwrite(os.path.join(args.out, f"avatar{pid}.png"),
                        to8b(renders[pid]))
        results["per_identity"][str(pid)] = {
            "own_psnr_db": psnr(renders[pid], teachers[pid]),
            "own_ssim": ssim(renders[pid], teachers[pid]),
            "cross_psnr_db": psnr(renders[pid], teachers[1 - pid]),
            "cross_ssim": ssim(renders[pid], teachers[1 - pid]),
        }

    art = args.artifacts or os.path.join(args.out, "avatar_student_quality.json")
    os.makedirs(os.path.dirname(os.path.abspath(art)), exist_ok=True)
    with open(art, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))

    if not args.quick:
        for pid in ("0", "1"):
            r = results["per_identity"][pid]
            assert r["own_psnr_db"] > r["cross_psnr_db"] + 3, r
            assert r["own_psnr_db"] > 18, r
    print("MULTI-AVATAR STUDENT OK")


if __name__ == "__main__":
    main()
