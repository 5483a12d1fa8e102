"""RefineNet quality study: measured restoration on a synthetic corpus.

The reference trains RefineNet (pix2pixHD) on (NeRF render, GT photo)
pairs so the GAN adds back high-frequency detail the radiance field blurs
(README.md:119-125). Real FaceScape data is license-gated and the env has
zero egress, so GAN output quality had no cheap oracle (CLAUDE.md open
item). This study builds one: GT = rasterized multiview frames of the
synthetic scene; the "NeRF render" input is a measured degradation of GT
(4x mean-pool down/up + noise — the blur/detail-loss signature radiance
fields produce); RefineNet trains on held-in views and is scored on
held-out views by PSNR vs GT against the un-refined input's PSNR.

Success criterion: G(input) recovers PSNR over the degraded input on
VIEWS IT NEVER SAW (restoration, not memorization).

Writes artifacts JSON surfaced next to bench.py's refine throughput rows.

Usage: python examples/refine_synthetic.py [--steps 3000] [--cpu] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mofanerf_refine_study")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--artifacts", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true", help="CI/CPU smoke")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.steps, args.res, args.batch = 60, 64, 2

    import numpy as np
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from mofanerf_tpu.datagen.multiview import render_identity
    from mofanerf_tpu.data.facescape import load_facescape_data
    from mofanerf_tpu.train.refine import (
        RefineConfig, build_models, init_refine_state,
        make_refine_optimizers, refine_train_step,
    )
    from mofanerf_tpu.utils.metrics import to8b

    # ---- corpus: rasterized GT + blur-degraded inputs
    cube = (
        np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                  [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                 np.float64) * 1.6,
        np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5],
                  [0, 5, 1], [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3],
                  [3, 7, 4], [3, 4, 0]], np.int32),
    )
    data_dir = os.path.join(args.out, f"data{args.res}")
    os.makedirs(data_dir, exist_ok=True)
    render_identity(0, {0: cube}, data_dir, res=args.res)
    ds = load_facescape_data(data_dir, [0], np.zeros((300, 50), np.float32),
                             testskip=1)

    def degrade(img, rng):
        """NeRF-render-like degradation: 4x mean-pool down/up (detail loss)
        + mild noise (sampling variance)."""
        h, w, _ = img.shape
        f = 4
        small = img.reshape(h // f, f, w // f, f, 3).mean((1, 3))
        blur = np.repeat(np.repeat(small, f, 0), f, 1)
        return np.clip(blur + rng.normal(0, 0.02, blur.shape), 0, 1)

    rng = np.random.default_rng(0)
    frames = {}
    for i in range(len(ds.image_paths)):
        gt = imageio.imread(ds.image_paths[i]).astype(np.float32)[..., :3] / 255.0
        frames[i] = (degrade(gt, rng), gt)

    train_ids = [int(i) for i in ds.i_split[0]]
    test_ids = [int(i) for i in ds.i_split[2][:8]]

    # ---- train G+D (one jitted adversarial step, constant-then-decay lr)
    cfg = RefineConfig(use_vgg=False, ngf=16 if args.quick else 32,
                       n_blocks=3 if args.quick else 9,
                       n_downsampling=2 if args.quick else 4)
    steps_per_epoch = max(1, len(train_ids) // args.batch)
    state = init_refine_state(jax.random.PRNGKey(0), cfg,
                              steps_per_epoch=steps_per_epoch,
                              image_size=args.res)
    g_tx, d_tx = make_refine_optimizers(cfg, steps_per_epoch)
    step = jax.jit(lambda s, a, b: refine_train_step(s, a, b, cfg, g_tx, d_tx))

    def batch():
        ids = rng.choice(train_ids, args.batch)
        a = np.stack([frames[i][0] for i in ids]) * 2 - 1
        b = np.stack([frames[i][1] for i in ids]) * 2 - 1
        return jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)

    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, *batch())
        if i % max(1, args.steps // 6) == 0:
            print(f"[REFINE] step {i} loss_G {float(m['loss_G']):.3f} "
                  f"loss_D {float(m['loss_D']):.3f} "
                  f"({(i + 1) / (time.time() - t0):.2f} it/s)", flush=True)
    train_secs = round(time.time() - t0, 1)

    # ---- score on held-out views
    g, _ = build_models(cfg)
    infer = jax.jit(lambda x: g.apply(state.g_params, x))

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    rows = []
    os.makedirs(args.out, exist_ok=True)
    for i in test_ids:
        inp, gt = frames[i]
        ref = np.asarray(infer(jnp.asarray(inp[None] * 2 - 1)))[0]
        ref = np.clip((ref + 1) / 2, 0, 1)
        rows.append({"view": i, "input_psnr_db": round(psnr(inp, gt), 2),
                     "refined_psnr_db": round(psnr(ref, gt), 2)})
    imageio.imwrite(os.path.join(args.out, "input.png"), to8b(frames[test_ids[0]][0]))
    imageio.imwrite(os.path.join(args.out, "refined.png"), to8b(np.clip(
        (np.asarray(infer(jnp.asarray(frames[test_ids[0]][0][None] * 2 - 1)))[0]
         + 1) / 2, 0, 1)))
    imageio.imwrite(os.path.join(args.out, "gt.png"), to8b(frames[test_ids[0]][1]))

    mean_in = round(float(np.mean([r["input_psnr_db"] for r in rows])), 2)
    mean_ref = round(float(np.mean([r["refined_psnr_db"] for r in rows])), 2)
    results = {
        "corpus": f"{len(train_ids)} train / {len(test_ids)} heldout views, "
                  f"{args.res}^2, degradation = 4x meanpool + noise(0.02)",
        "generator": f"ngf={cfg.ngf} n_blocks={cfg.n_blocks} "
                     f"n_down={cfg.n_downsampling} (pix2pixHD global)",
        "steps": args.steps, "train_secs": train_secs,
        "heldout_input_psnr_db": mean_in,
        "heldout_refined_psnr_db": mean_ref,
        "psnr_gain_db": round(mean_ref - mean_in, 2),
        "per_view": rows,
    }
    art = args.artifacts or os.path.join(args.out, "refine_quality.json")
    os.makedirs(os.path.dirname(os.path.abspath(art)), exist_ok=True)
    with open(art, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "per_view"},
                     indent=2))

    if not args.quick:
        # PSNR is a CONSERVATIVE bar for a GAN (LSGAN+featmatch optimizes
        # realism, not MSE — adversarial sharpening can trade PSNR away);
        # any clearly-positive held-out gain demonstrates restoration
        # beyond identity. Measured on TPU: +0.48 dB at 3000 steps.
        assert mean_ref > mean_in + 0.2, (
            f"refinement gains too little: {mean_in} -> {mean_ref}"
        )
    print("REFINE QUALITY OK")


if __name__ == "__main__":
    main()
