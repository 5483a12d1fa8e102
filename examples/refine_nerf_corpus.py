"""Close the RefineNet loop on REAL NeRF renders (VERDICT r2 #2).

The reference pipeline is: trained coarse model -> render_refine_trainSet
corpus (render_refine_trainSet.py:242-307) -> GT pairing -> pix2pixHD
training on the NeRF's own artifacts (run_train_refineNet.py:23-150).
Round 2 proved restoration only on synthetic meanpool+noise degradations;
this study drives the actual workflow end-to-end:

1. `cli.render_refine_trainset` renders a corpus with the TRAINED flagship
   model (the morphable_flagship checkpoint) at dataset poses,
2. `cli.prepare_refine_trainset` mirrors the pixel-aligned GT tree,
3. the GAN trains on (NeRF render, GT) pairs with a held-out view split,
4. held-out gain is measured on NeRF artifacts: PSNR + SSIM + a VGG-feature
   distance. NOTE: torchvision VGG19 weights are unfetchable in this env
   (zero egress), so the feature distance uses a FIXED random-init VGG19 —
   a random-projection perceptual proxy, labeled as such in the artifact.

Writes artifacts/refine_nerf_quality.json + before/after PNGs.

Usage (after examples/morphable_flagship.py --stage train):
  python examples/refine_nerf_corpus.py --steps 3000
CPU smoke: --quick --small_model (tiny dims, untrained model).
"""
from __future__ import annotations

import argparse
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
    p.add_argument("--corpus_dir", default="studydata/refine_corpus")
    p.add_argument("--n_ids", type=int, default=8)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--exp_num", type=int, default=3)
    p.add_argument("--view_num", type=int, default=8)
    p.add_argument("--heldout_views", type=int, default=2,
                   help="per-(id,exp) views held out of GAN training")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--use_vgg", type=int, default=1,
                   help="train with the perceptual term (a FIXED random-init "
                        "VGG19 — trainable perceptual loss when pretrained "
                        "weights are unfetchable; round 3 ran without it "
                        "and the GAN hallucinated texture, -1.0 dB)")
    p.add_argument("--lambda_l1", type=float, default=10.0,
                   help="L1 reconstruction anchor weight (0 = reference "
                        "parity; see RefineConfig.lambda_l1)")
    p.add_argument("--near", type=float, default=8.0)
    p.add_argument("--far", type=float, default=26.0)
    p.add_argument("--fast", action="store_true",
                   help="occupancy-culled corpus rendering (~4x)")
    p.add_argument("--min_input_psnr_db", type=float, default=16.0,
                   help="corpus sanity floor: any (render, GT) pair below "
                        "this is a corpus DEFECT (stale data, background "
                        "mismatch, broken pose), not NeRF blur — round 4's "
                        "+1.25 dB headline was half GAN-papering-over 9-11 "
                        "dB broken identity-0 views. Fail loudly instead.")
    p.add_argument("--out_json", default="artifacts/refine_nerf_quality.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--small_model", action="store_true",
                   help="tiny field dims (CPU smoke against an untrained model)")
    p.add_argument("--white_bkgd", action="store_true",
                   help="must match the checkpoint's training setting; also "
                        "composites GT over white in the pairing step")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.steps, args.exp_num, args.view_num = 80, 1, 3
        args.heldout_views = 1

    import numpy as np
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from mofanerf_tpu.cli.prepare_refine_trainset import main as prepare_main
    from mofanerf_tpu.cli.render_refine_trainset import main as render_main
    from mofanerf_tpu.models.refine.losses import VGG19Features
    from mofanerf_tpu.train.refine import (
        RefineConfig, build_models, init_refine_state,
        make_refine_optimizers, refine_train_step,
    )
    from mofanerf_tpu.utils.metrics import img2mse, mse2psnr, ssim as ssim_fn, to8b

    cfg_flags = [
        "--expname", args.expname,
        "--basedir", args.basedir,
        "--datadir", args.data,
        "--uvdir", os.path.join(args.data, "uv"),
        "--shape_codes_path", os.path.join(args.data, "factors_id.npy"),
        "--person_num", str(args.n_ids),
    ]
    if args.white_bkgd:
        cfg_flags += ["--white_bkgd", "True"]
    cfg_flags += ["--near", str(args.near), "--far", str(args.far)]
    if args.small_model:
        cfg_flags += [
            "--netdepth", "2", "--netwidth", "8",
            "--netdepth_fine", "2", "--netwidth_fine", "16",
            "--N_samples", "8", "--N_importance", "8",
            "--compute_dtype", "float32", "--packet_size", "1024",
        ]

    # ---- 1+2: corpus render + GT pairing through the real CLIs (resumable)
    renders_dir = os.path.join(args.corpus_dir, "train")
    gt_dir = os.path.join(args.corpus_dir, "gt")
    render_main([
        "--out_dir", renders_dir,
        "--exp_num", str(args.exp_num), "--view_num", str(args.view_num),
        "--res", str(args.res),
    ] + (["--fast"] if args.fast else []) + cfg_flags)
    prepare_main(["--renders_dir", renders_dir, "--out_dir", gt_dir]
                 + (["--white_bkgd"] if args.white_bkgd else []))

    manifest = json.load(open(os.path.join(renders_dir, "gt_manifest.json")))
    pairs = []
    for rel in sorted(manifest):
        rp, gp = os.path.join(renders_dir, rel), os.path.join(gt_dir, rel)
        if os.path.exists(rp) and os.path.exists(gp):
            a = np.asarray(imageio.imread(rp), np.float32)[..., :3] / 255.0
            b = np.asarray(imageio.imread(gp), np.float32)[..., :3] / 255.0
            pairs.append((rel, a, b))
    assert pairs, "empty corpus"
    print(f"corpus: {len(pairs)} (render, GT) pairs at {args.res}^2")

    # corpus sanity: per-identity input PSNR + hard floor on every pair
    def _np_psnr(a, b):
        return float(-10.0 * np.log10(max(np.mean((a - b) ** 2), 1e-12)))

    in_psnr = {rel: _np_psnr(a, b) for rel, a, b in pairs}
    by_ident = {}
    for rel, v in in_psnr.items():
        by_ident.setdefault(rel.split(os.sep)[0], []).append(v)
    for ident in sorted(by_ident, key=int):
        vs = by_ident[ident]
        print(f"  id {ident}: input psnr mean {np.mean(vs):.2f} "
              f"min {min(vs):.2f} dB over {len(vs)} views")
    defects = sorted((v, rel) for rel, v in in_psnr.items()
                     if v < args.min_input_psnr_db)
    if defects and not args.small_model:
        raise SystemExit(
            f"CORPUS DEFECT: {len(defects)} pairs below "
            f"{args.min_input_psnr_db} dB input PSNR (worst: {defects[:8]}) "
            f"— fix the corpus before training; a GAN will happily 'gain' "
            f"10+ dB repairing broken data and inflate the headline")

    # held-out split: the LAST heldout_views views of each (id, exp) group
    # (always keeping at least one training view per group); if every group
    # is a single view, fall back to holding out every 4th pair
    groups = {}
    for p_ in pairs:
        groups.setdefault(os.path.dirname(p_[0]), []).append(p_)
    train_pairs, test_pairs = [], []
    for g_ in groups.values():
        g_.sort(key=lambda p_: p_[0])
        n_hold = min(args.heldout_views, len(g_) - 1)
        train_pairs += g_[: len(g_) - n_hold]
        test_pairs += g_[len(g_) - n_hold:]
    if not test_pairs:
        test_pairs = train_pairs[::4]
        train_pairs = [p_ for p_ in train_pairs if p_ not in test_pairs]
    print(f"GAN split: {len(train_pairs)} train / {len(test_pairs)} held-out")

    # ---- 3: GAN training on the NeRF's own artifacts
    rcfg = RefineConfig(use_vgg=bool(args.use_vgg),
                        lambda_l1=args.lambda_l1,
                        ngf=16 if args.quick else 32,
                        n_blocks=3 if args.quick else 9,
                        n_downsampling=2 if args.quick else 4)
    steps_per_epoch = max(1, len(train_pairs) // args.batch)
    state = init_refine_state(jax.random.PRNGKey(0), rcfg,
                              steps_per_epoch=steps_per_epoch,
                              image_size=args.res)
    g_tx, d_tx = make_refine_optimizers(rcfg, steps_per_epoch)
    # training-time perceptual net: fixed random-init VGG19 (reference
    # trains with pretrained VGG, run_train_refineNet-era pix2pixHD; weights
    # unfetchable). Seed 7 — DISTINCT from the seed-42 eval proxy below, so
    # the evaluation features are not the training objective.
    train_vgg_params = None
    if rcfg.use_vgg:
        tvgg = VGG19Features()
        train_vgg_params = tvgg.init(
            jax.random.PRNGKey(7), jnp.zeros((1, args.res, args.res, 3)))
    step = jax.jit(lambda s, a, b: refine_train_step(
        s, a, b, rcfg, g_tx, d_tx, vgg_params=train_vgg_params))

    rng = np.random.default_rng(0)

    def batch():
        ids = rng.choice(len(train_pairs), args.batch)
        a = np.stack([train_pairs[i][1] for i in ids]) * 2 - 1
        b = np.stack([train_pairs[i][2] for i in ids]) * 2 - 1
        return jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)

    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, *batch())
        if i % max(1, args.steps // 6) == 0:
            print(f"[REFINE-NERF] step {i} loss_G {float(m['loss_G']):.3f} "
                  f"loss_D {float(m['loss_D']):.3f} "
                  f"({(i + 1) / (time.time() - t0):.2f} it/s)", flush=True)
    train_secs = round(time.time() - t0, 1)

    # ---- 4: held-out measurement on NeRF artifacts
    g, _ = build_models(rcfg)
    infer = jax.jit(lambda x: g.apply(state.g_params, x))

    # perceptual proxy: FIXED random-init VGG19 feature distance (weights
    # unfetchable here — random projections still order blur vs detail)
    vgg = VGG19Features()
    vgg_params = vgg.init(jax.random.PRNGKey(42),
                          jnp.zeros((1, args.res, args.res, 3)))
    feats = jax.jit(lambda x: vgg.apply(vgg_params, x))

    def vgg_dist(a, b):
        fa = feats(jnp.asarray(a[None] * 2 - 1, jnp.float32))
        fb = feats(jnp.asarray(b[None] * 2 - 1, jnp.float32))
        return float(sum(jnp.mean(jnp.abs(x - y)) for x, y in zip(fa, fb)))

    def psnr(a, b):
        return float(mse2psnr(img2mse(jnp.asarray(a), jnp.asarray(b))))

    rows = []
    for rel, a, b in test_pairs:
        ref = np.asarray(infer(jnp.asarray(a[None] * 2 - 1, jnp.float32)))[0]
        ref = np.clip((ref + 1) / 2, 0, 1)
        rows.append({
            "view": rel,
            "input_psnr_db": round(psnr(a, b), 2),
            "refined_psnr_db": round(psnr(ref, b), 2),
            "input_ssim": round(float(ssim_fn(jnp.asarray(a), jnp.asarray(b))), 4),
            "refined_ssim": round(float(ssim_fn(jnp.asarray(ref), jnp.asarray(b))), 4),
            "input_vgg_dist": round(vgg_dist(a, b), 4),
            "refined_vgg_dist": round(vgg_dist(ref, b), 4),
        })

    out_dir = os.path.dirname(os.path.abspath(args.out_json))
    os.makedirs(out_dir, exist_ok=True)
    rel0, a0, b0 = test_pairs[0]
    ref0 = np.clip((np.asarray(infer(jnp.asarray(a0[None] * 2 - 1,
                                                 jnp.float32)))[0] + 1) / 2, 0, 1)
    stem = os.path.splitext(os.path.basename(args.out_json))[0]
    imageio.imwrite(os.path.join(out_dir, f"{stem}_triptych.png"),
                    to8b(np.concatenate([a0, ref0, b0], axis=1)))

    def mean(k):
        return round(float(np.mean([r[k] for r in rows])), 4)

    def median(k):
        return round(float(np.median([r[k] for r in rows])), 4)

    gains = [r["refined_psnr_db"] - r["input_psnr_db"] for r in rows]

    results = {
        "study": "RefineNet trained on REAL NeRF renders of the flagship "
                 "morphable model (full corpus workflow: "
                 "render_refine_trainset -> prepare_refine_trainset -> GAN)",
        "corpus": {"pairs": len(pairs), "gan_train": len(train_pairs),
                   "heldout": len(test_pairs), "res": args.res,
                   "renders_dir": renders_dir},
        "generator": f"ngf={rcfg.ngf} n_blocks={rcfg.n_blocks} "
                     f"n_down={rcfg.n_downsampling} (pix2pixHD global)",
        "loss": {"use_vgg": rcfg.use_vgg,
                 "vgg_note": "fixed random-init VGG19, seed 7 (train) vs "
                             "seed 42 (eval proxy) — independent nets",
                 "lambda_l1": rcfg.lambda_l1,
                 "lambda_feat": rcfg.lambda_feat},
        "steps": args.steps, "train_secs": train_secs,
        "heldout_input_psnr_db": mean("input_psnr_db"),
        "heldout_refined_psnr_db": mean("refined_psnr_db"),
        "psnr_gain_db": round(mean("refined_psnr_db") - mean("input_psnr_db"), 2),
        "psnr_gain_median_db": round(float(np.median(gains)), 2),
        "views_improved": int(sum(g > 0 for g in gains)),
        "views_total": len(gains),
        "min_input_psnr_db": round(min(r["input_psnr_db"] for r in rows), 2),
        "heldout_input_ssim": mean("input_ssim"),
        "heldout_refined_ssim": mean("refined_ssim"),
        "heldout_input_vgg_dist": mean("input_vgg_dist"),
        "heldout_refined_vgg_dist": mean("refined_vgg_dist"),
        "vgg_note": "FIXED random-init VGG19 feature distance (torchvision "
                    "weights unfetchable in this env) — a random-projection "
                    "perceptual proxy, lower is better",
        "per_view": rows,
    }
    with open(args.out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "per_view"},
                     indent=2))


if __name__ == "__main__":
    main()
