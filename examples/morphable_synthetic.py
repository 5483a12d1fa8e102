"""Morphable-model demo: one network, two identities, then inverse fitting.

The core MoFaNeRF capability: a SINGLE trained model represents multiple
identities through conditioning codes. This demo
1. produces two synthetic identities (cube and octahedron) with the
   software rasterizer,
2. trains one model on both, conditioned on distinct shape codes,
3. checks identity control: rendering identity A's code must match A's
   geometry, and swapping in B's code must swap the output,
4. runs the fitting loop: starting from random codes, recover identity A's
   codes from ONE held-out image by gradient descent through the renderer.

No external data needed.  Usage: python examples/morphable_synthetic.py
"""
from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_morph")
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--fit_iters", type=int, default=300)
    p.add_argument("--res", type=int, default=64)
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
    from mofanerf_tpu.train.state import (
        Batch, create_train_state, make_optimizer, train_step,
    )
    from mofanerf_tpu.train.fit import FitConfig, fit_step, init_fit_state, make_fit_optimizer
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.utils.metrics import to8b

    # ---- 1. two identities with distinct geometry
    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    cube_v = np.array([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ], np.float64) * 1.6
    cube_f = np.array([
        [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
        [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
    ], np.int32)
    octa_v = np.array([
        [2.2, 0, 0], [-2.2, 0, 0], [0, 2.2, 0], [0, -2.2, 0], [0, 0, 2.2], [0, 0, -2.2],
    ])
    octa_f = np.array([
        [0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5],
    ], np.int32)
    render_identity(0, {0: (cube_v, cube_f)}, data_dir, res=args.res)
    render_identity(1, {0: (octa_v, octa_f)}, data_dir, res=args.res)

    shape_codes = np.zeros((300, 50), np.float32)
    shape_codes[0, 0] = 1.0   # distinct identity factors
    shape_codes[1, 1] = 1.0
    ds = load_facescape_data(data_dir, [0, 1], shape_codes, testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    # ---- 2. train one model on both
    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=64),
        fine=FieldConfig(depth=8, width=128),
        render=RenderConfig(n_coarse=32, n_importance=32, packet_size=4096,
                            raw_noise_std=1.0),
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=1e-3)
    tx = make_optimizer(lrate=1e-3)
    step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))

    rng = np.random.default_rng(0)
    uvs = {0: jnp.full((128, 128, 3), 0.3), 1: jnp.full((128, 128, 3), 0.7)}
    images = {}

    def batch_for(i):
        img_i = int(rng.choice(ds.i_split[0]))
        pid = int(ds.id_codes[img_i])
        if img_i not in images:
            img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
            images[img_i] = img[..., :3]
        target = images[img_i]
        obj_r, obj_c = np.nonzero(target.sum(-1) > 0.05)
        n_obj = min(614, obj_r.shape[0])
        pick = rng.integers(0, obj_r.shape[0], n_obj) if n_obj else np.empty(0, int)
        coords = np.concatenate([
            np.stack([obj_r[pick], obj_c[pick]], -1),
            np.stack([rng.integers(0, H, 1024 - n_obj), rng.integers(0, W, 1024 - n_obj)], -1),
        ], 0)
        ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                             jnp.asarray(ds.poses[img_i]))
        return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                     jnp.asarray(ds.shape_codes[img_i]), jnp.asarray(0), uvs[pid])

    t0 = time.time()
    for i in range(args.iters):
        state, m = step_fn(state, batch_for(i), jax.random.PRNGKey(i))
        if i % 250 == 0:
            print(f"iter {i:4d} loss {float(m['loss']):.4f} psnr {float(m['psnr']):.2f} "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)")

    # ---- 3. identity control check on a held-out view of identity 0
    test_idx = {int(ds.id_codes[i]): int(i) for i in ds.i_split[2]}
    conds = {}
    for pid in (0, 1):
        tex = encode_texture(state.params, spec, uvs[pid])
        conds[pid] = prepare_conditioning(
            state.params, spec, jnp.asarray(shape_codes[pid]),
            exp_code_for(state.params, 0), tex,
        )
    results = {}
    for pid in (0, 1):
        ti = test_idx[0]  # same camera (identity 0's held-out view)
        out = render_frame(state.params, spec, conds[pid], H, W, jnp.asarray(K),
                           jnp.asarray(ds.poses[ti][:3]))
        results[pid] = np.asarray(out["rgb"])
        imageio.imwrite(os.path.join(args.out, f"id{pid}_render.png"), to8b(results[pid]))
    gt0 = imageio.imread(ds.image_paths[test_idx[0]]).astype(np.float32)[..., :3] / 255.0
    gt1 = imageio.imread(ds.image_paths[test_idx[1]]).astype(np.float32)[..., :3] / 255.0

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2)))

    p00, p01 = psnr(results[0], gt0), psnr(results[0], gt1)
    p10 = psnr(results[1], gt0)
    swap = float(np.abs(results[0] - results[1]).mean())
    print(f"\nidentity 0 render vs own GT: {p00:.2f} dB (vs other identity: {p01:.2f})")
    print(f"identity swap changes the image by mean |d|={swap:.4f}")

    # ---- 4. inverse fitting: recover identity-0 codes from one image
    fcfg = FitConfig(n_iters=args.fit_iters, n_rand=512, H=H, W=W, focal=float(focal),
                     change_epoch=(0, 50, 100, 150, 200))
    fstate = init_fit_state(jax.random.PRNGKey(7), fcfg, ds.poses[test_idx[0]])
    ftx = make_fit_optimizer(fcfg)
    fit_jit = jax.jit(lambda s, c, t: fit_step(state.params, spec, ftx, s, c, t,
                                               jnp.asarray(K)))
    losses = []
    for e in range(args.fit_iters):
        obj_r, obj_c = np.nonzero(gt0.sum(-1) > 0.05)
        pick = rng.integers(0, obj_r.shape[0], 307)
        coords = np.concatenate([
            np.stack([obj_r[pick], obj_c[pick]], -1),
            np.stack([rng.integers(0, H, 205), rng.integers(0, W, 205)], -1),
        ], 0).astype(np.float32)
        targets = jnp.asarray(gt0[coords[:, 0].astype(int), coords[:, 1].astype(int)])
        fstate, loss = fit_jit(fstate, jnp.asarray(coords), targets)
        losses.append(float(loss))
        if e % 100 == 0:
            print(f"fit iter {e} loss {losses[-1]:.4f}")

    cond_fit = prepare_conditioning(state.params, spec, fstate.codes.shape,
                                    fstate.codes.exp, fstate.codes.tex)
    out = render_frame(state.params, spec, cond_fit, H, W, jnp.asarray(K),
                       fstate.codes.pose[:3])
    fit_img = float(fstate.codes.light[0]) * np.asarray(out["rgb"])
    imageio.imwrite(os.path.join(args.out, "fit_render.png"), to8b(fit_img))
    p_fit = psnr(np.clip(fit_img, 0, 1), gt0)
    print(f"\nfit: loss {losses[0]:.4f} -> {min(losses):.4f}; "
          f"render vs target {p_fit:.2f} dB")
    print(f"outputs in {args.out}")


if __name__ == "__main__":
    main()
