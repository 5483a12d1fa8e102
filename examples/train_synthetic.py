"""End-to-end smoke demo: dataset production -> training -> rendering.

Produces a multiview dataset of a cube with the software rasterizer,
trains a small MoFaNeRF on it (one identity, one expression), and reports
the PSNR trajectory plus a held-out render. No external data needed.

Usage: python examples/train_synthetic.py [--iters 300] [--out /tmp/synth]
"""
from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_synth")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
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
    from mofanerf_tpu.ops.rays import get_rays_at
    from mofanerf_tpu.utils.metrics import to8b

    # ---- 1. produce the dataset (cube, 120 views)
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

    shape_codes = np.zeros((300, 50), np.float32)
    ds = load_facescape_data(data_dir, [0], shape_codes, testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    # ---- 2. train
    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=args.width),
        fine=FieldConfig(depth=8, width=args.width * 2),
        render=RenderConfig(n_coarse=32, n_importance=32, packet_size=4096,
                            raw_noise_std=1.0),  # keeps dead-relu densities trainable
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec, lrate=1e-3)
    tx = make_optimizer(lrate=1e-3)
    step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))

    rng = np.random.default_rng(0)
    uv = jnp.full((128, 128, 3), 0.5)
    images = {}

    def batch_for(i):
        img_i = int(rng.choice(ds.i_split[0]))
        if img_i not in images:
            img = imageio.imread(ds.image_paths[img_i]).astype(np.float32) / 255.0
            images[img_i] = img[..., :3]
        target = images[img_i]
        # Object-biased ray sampling (the cube analog of the reference's
        # landmark-biased sampling, run_train.py:324-328): 60% of rays on
        # object pixels, 40% uniform — uniform-only sampling lets the 75%
        # background rays collapse the density field.
        obj_r, obj_c = np.nonzero(target.sum(-1) > 0.05)
        n_obj = min(614, obj_r.shape[0])
        pick = rng.integers(0, obj_r.shape[0], n_obj) if n_obj else np.empty(0, int)
        obj_coords = np.stack([obj_r[pick], obj_c[pick]], -1)
        n_uni = 1024 - n_obj
        uni = np.stack([rng.integers(0, H, n_uni), rng.integers(0, W, n_uni)], -1)
        coords = np.concatenate([obj_coords, uni], 0)
        ro, rd = get_rays_at(jnp.asarray(coords, jnp.float32), jnp.asarray(K),
                             jnp.asarray(ds.poses[img_i]))
        return Batch(ro, rd, jnp.asarray(target[coords[:, 0], coords[:, 1]]),
                     jnp.zeros(50), jnp.asarray(0), uv)

    psnrs = []
    t0 = time.time()
    for i in range(args.iters):
        state, m = step_fn(state, batch_for(i), jax.random.PRNGKey(i))
        if i % 25 == 0 or i == args.iters - 1:
            psnr = float(m["psnr"])
            psnrs.append(psnr)
            print(f"iter {i:4d}  loss {float(m['loss']):.4f}  psnr {psnr:.2f}  "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)")

    # ---- 3. held-out render
    test_i = int(ds.i_split[2][0])
    tex = encode_texture(state.params, spec, uv)
    cond = prepare_conditioning(state.params, spec, jnp.zeros(50),
                                exp_code_for(state.params, 0), tex)
    out = render_frame(state.params, spec, cond, H, W, jnp.asarray(K),
                       jnp.asarray(ds.poses[test_i][:3]))
    gt = imageio.imread(ds.image_paths[test_i]).astype(np.float32) / 255.0
    mse = float(np.mean((np.asarray(out["rgb"]) - gt[..., :3]) ** 2))
    test_psnr = -10 * np.log10(mse)
    imageio.imwrite(os.path.join(args.out, "test_render.png"), to8b(np.asarray(out["rgb"])))
    imageio.imwrite(os.path.join(args.out, "test_gt.png"), to8b(gt[..., :3]))
    print(f"\ntrain PSNR: {psnrs[0]:.2f} -> {psnrs[-1]:.2f} dB")
    print(f"held-out view PSNR: {test_psnr:.2f} dB")
    print(f"outputs in {args.out}")


if __name__ == "__main__":
    main()
