"""Host-side training driver.

Capability parity with the reference coarse-training loop
(run_train.py:165-410): per-iteration pick a random training image, read
target + UV map, landmark-biased ray selection (with center precrop for the
first `precrop_iters`), render N_rand rays through the two-pass model,
MSE(fine)+MSE(coarse), Adam with exponential decay, interval checkpointing,
periodic held-out renders, text logging.

TPU-first: the device step (encode + fold + render + loss + update) is the
single jitted `train_step`; this file only does host I/O, index sampling,
and orchestration. UV maps are cached in host RAM after first read. Unlike
the reference there is no DataParallel wrap and no crash-retry-by-rebuild
(run_train.py:348-356) — a jitted pure function either compiles or doesn't.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.config import Config
from mofanerf_tpu.data.facescape import (
    load_facescape_data,
    load_shape_codes,
    read_image,
    valid_persons,
)
from mofanerf_tpu.data.landmarks import TrainRaySampler, anneal_lm_frac
from mofanerf_tpu.ops.occupancy import (
    OccupancyGrid,
    load_grid,
    save_grid,
    update_occupancy_grid,
)
from mofanerf_tpu.ops.rays import get_rays_at
from mofanerf_tpu.render.renderer import (
    prepare_conditioning,
    render_frame,
    exp_code_for,
    encode_texture,
)
from mofanerf_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from mofanerf_tpu.train.state import (
    Batch,
    create_train_state,
    make_optimizer,
    train_step,
)
from mofanerf_tpu.utils.logger import TrainLogger
from mofanerf_tpu.utils.metrics import to8b


def train(cfg: Config, n_iters: Optional[int] = None, seed: int = 0) -> None:
    spec = cfg.model_spec()
    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    os.makedirs(exp_dir, exist_ok=True)
    logger = TrainLogger(os.path.join(exp_dir, "train_log.txt"))

    # per-run config snapshot (run_train.py:213-224 parity): args.txt with
    # every flag, config.txt mirroring the config file when one was used
    import dataclasses as _dc

    with open(os.path.join(exp_dir, "args.txt"), "w") as f:
        for k, v in sorted(_dc.asdict(cfg).items()):
            f.write(f"{k} = {v}\n")
    if cfg.config and os.path.exists(cfg.config):
        with open(cfg.config) as src, open(os.path.join(exp_dir, "config.txt"), "w") as dst:
            dst.write(src.read())

    persons = valid_persons(cfg.datadir, cfg.person_num)
    shape_codes = load_shape_codes(cfg.shape_codes_path)
    ds = load_facescape_data(
        cfg.datadir, persons, shape_codes, uvdir=cfg.uvdir,
        half_res=cfg.half_res, testskip=cfg.testskip,
    )
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)

    landmarks = None
    if os.path.exists(cfg.landmarks_path):
        # world units: raw landmarks / 50 (run_train.py:121)
        landmarks = np.load(cfg.landmarks_path) / 50.0
    sampler = TrainRaySampler(landmarks, H, W, lm_frac=cfg.lm_frac)

    state = create_train_state(jax.random.PRNGKey(seed), spec, cfg.lrate, cfg.lrate_decay)
    tx = make_optimizer(cfg.lrate, cfg.lrate_decay)
    start = 0
    if not cfg.no_reload and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        start = int(state.step)
        logger.note(f"resumed from checkpoint at step {start}")
    else:
        # ADVICE r4: a fresh run appending to a surviving log looks like a
        # broken resume (counter "restarts"); say explicitly that there was
        # no checkpoint and step/lr-decay start from 0 by design.
        logger.note("no checkpoint found — FRESH run (step and lr schedule "
                    "start at 0; log below appends to any prior run's)")

    step_fn = jax.jit(lambda s, b, k: train_step(s, b, k, spec, tx))

    # --- training-time occupancy-grid maintenance (NerfAcc-style EMA): the
    # production fast-render path needs a density grid; maintaining it on an
    # interval during training (instead of a manual export step afterwards)
    # keeps it current and checkpoints it beside the train state. The EMA
    # max-union across the per-step conditioning means the grid converges to
    # a conservative superset over all trained identities/expressions.
    grid, density_ema, grid_update_fn = None, None, None
    grid_path = os.path.join(ckpt_dir, "occupancy_grid.npz")
    if cfg.i_grid > 0:
        G = cfg.grid_resolution
        grid = OccupancyGrid(
            jnp.zeros((G, G, G), bool), jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3)
        )
        density_ema = jnp.zeros((G ** 3,), jnp.float32)
        if start > 0 and os.path.exists(grid_path):
            grid, ema = load_grid(grid_path)
            if ema is not None:
                density_ema = ema
            logger.note("resumed occupancy grid")

        @jax.jit
        def grid_update_fn(params, batch, grid, ema):
            tex = encode_texture(params, spec, batch.uv_map)
            c = prepare_conditioning(
                params, spec, batch.shape_code,
                exp_code_for(params, batch.exp_type), tex,
            )
            # probe the COARSE field: the fine net is unconstrained off the
            # importance-sample distribution (ops/occupancy.py
            # build_proposal_grid), and this grid feeds run_render --fast
            return update_occupancy_grid(
                grid, ema, params["coarse"], spec.coarse, c.coarse,
                cfg.grid_ema_decay, cfg.grid_density_threshold,
                spec.render.sigma_activation,
            )

    uv_cache = {}
    rng = np.random.default_rng(seed + 1)
    # separate generator for periodic eval renders: `rng` is consumed from
    # the prefetch worker thread (numpy Generators are not thread-safe)
    rng_eval = np.random.default_rng(seed + 2)
    i_train = ds.i_split[0]
    n_total = n_iters if n_iters is not None else cfg.n_iters
    if cfg.device_data:
        _train_device_data(
            cfg, spec, state, tx, ds, K, landmarks, logger, ckpt_dir,
            exp_dir, grid, density_ema, grid_update_fn, grid_path,
            start, n_total, seed, uv_cache, rng_eval,
        )
        return
    t0 = time.time()

    def make_batch(i: int) -> Batch:
        """Host-side batch assembly (disk reads + index sampling) — runs on
        the prefetch thread, overlapping the device step."""
        img_i = int(rng.choice(i_train))
        pid = int(ds.id_codes[img_i])
        if pid not in uv_cache:
            uv_cache[pid] = read_image(ds.uv_paths[pid], is_uvmap=True,
                                       uv_size=spec.uv_size)
        target = read_image(ds.image_paths[img_i], half_res=cfg.half_res,
                            white_bkgd=cfg.white_bkgd)
        pose = ds.poses[img_i]
        precrop = cfg.precrop_frac if i < cfg.precrop_iters else None
        coords = sampler.sample(
            rng, cfg.N_rand, K, pose, pid, int(ds.exp_types[img_i]),
            precrop_frac=precrop, target_img=target,
            lm_frac=anneal_lm_frac(i, cfg.lm_frac, cfg.lm_frac_anneal_iters),
        )
        rays_o, rays_d = get_rays_at(
            jnp.asarray(coords, jnp.float32), jnp.asarray(K), jnp.asarray(pose)
        )
        return Batch(
            rays_o=rays_o,
            rays_d=rays_d,
            target_rgb=jnp.asarray(target[coords[:, 0], coords[:, 1]]),
            shape_code=jnp.asarray(ds.shape_codes[img_i]),
            exp_type=jnp.asarray(int(ds.exp_types[img_i]), jnp.int32),
            uv_map=jnp.asarray(uv_cache[pid]),
        )

    from mofanerf_tpu.data.prefetch import Prefetcher

    batches = Prefetcher(make_batch, depth=2).iterate(start, n_total)
    for i, batch in zip(range(start, n_total), batches):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(seed * 1_000_003 + i))

        if (
            grid_update_fn is not None
            and (i + 1) >= cfg.grid_warmup
            and (i + 1) % cfg.i_grid == 0
        ):
            grid, density_ema = grid_update_fn(state.params, batch, grid, density_ema)

        if (i + 1) % cfg.i_print == 0:
            loss = float(metrics["loss"])
            psnr = float(metrics["psnr"])
            rate = (i + 1 - start) / (time.time() - t0)
            print(f"[TRAIN] iter {i + 1} loss {loss:.5f} psnr {psnr:.2f} it/s {rate:.2f}")
            logger.write(i + 1, Loss=loss, PSNR=psnr)

        if (i + 1) % cfg.i_weights == 0:
            path = save_checkpoint(ckpt_dir, state, i + 1)
            if grid is not None:
                save_grid(grid_path, grid, density_ema)
            logger.note(f"checkpoint saved: {path}")

        if (i + 1) % cfg.i_testset == 0 and len(ds.i_split[2]) > 0:
            _render_test_image(cfg, spec, state, ds, K, rng_eval, exp_dir, i + 1, uv_cache)

        if (i + 1) % cfg.i_video == 0:
            _render_orbit_video(cfg, spec, state, ds, rng_eval, exp_dir, i + 1, uv_cache)

    save_checkpoint(ckpt_dir, state, n_total)
    if grid is not None:
        save_grid(grid_path, grid, density_ema)
    logger.note("training finished")


def _auto_scan_steps(cfg: Config, n_total: int) -> int:
    """Steps per device dispatch for the device-data path: the gcd of every
    active logging/checkpoint interval (so chunk boundaries land exactly on
    them), capped at 100."""
    import math

    g = 0
    for v in (cfg.i_print, cfg.i_weights, cfg.i_testset, cfg.i_video,
              cfg.i_grid):
        if 0 < v <= n_total:
            g = math.gcd(g, v)
    return max(1, min(g or 100, 100))


def _train_device_data(cfg, spec, state, tx, ds, K, landmarks, logger,
                       ckpt_dir, exp_dir, grid, density_ema, grid_update_fn,
                       grid_path, start, n_total, seed, uv_cache, rng_eval):
    """Device-resident training driver (data/device_data.py): the train
    split lives in HBM, batches are sampled in-graph, and `scan_steps`
    optimizer steps run per dispatch under one lax.scan — the host does
    nothing in steady state but fire chunks and handle interval I/O.

    Replaces the reference's host DataLoader thread pool
    (run_train.py:335) with the TPU-native equivalent: zero per-step
    host->device traffic, one runtime round-trip per chunk."""
    from functools import partial

    from mofanerf_tpu.data.device_data import (
        DeviceSamplerConfig,
        build_device_dataset,
        sample_batch_device,
    )

    H, W, _ = ds.hwf
    dd, bias = build_device_dataset(
        ds, K, ds.i_split[0], landmarks=landmarks, uv_size=spec.uv_size,
        half_res=cfg.half_res, white_bkgd=cfg.white_bkgd, seed=seed,
        bias_override=cfg.ray_bias,
    )
    scfg = DeviceSamplerConfig(
        n_rand=cfg.N_rand, H=H, W=W,
        precrop_iters=cfg.precrop_iters, precrop_frac=cfg.precrop_frac,
        lm_frac=cfg.lm_frac, lm_frac_anneal_iters=cfg.lm_frac_anneal_iters,
        bias=bias,
    )
    Kj = jnp.asarray(K)
    base_key = jax.random.PRNGKey(seed * 7919 + 13)
    C = cfg.scan_steps if cfg.scan_steps > 0 else _auto_scan_steps(cfg, n_total)
    logger.note(f"device-data path: {dd.images.shape[0]} frames resident, "
                f"bias={bias}, {C} steps/dispatch")

    # NOTE: the store is a TRACED argument, not a closure — a closed-over
    # store is serialized into the compile payload as constants, and a
    # multi-thousand-frame dataset blows the relay's request-size limit
    # (HTTP 413 observed at ~1 GB with 16 ids x 20 expressions).
    @partial(jax.jit, static_argnames="n_steps")
    def run_chunk(state, store, i0, n_steps: int):
        def body(st, t):
            i = i0 + t
            k = jax.random.fold_in(base_key, i)
            batch = sample_batch_device(store, Kj, i, jax.random.fold_in(k, 0),
                                        scfg)
            return train_step(st, batch, jax.random.fold_in(k, 1), spec, tx)

        state, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    sample_jit = jax.jit(
        lambda store, i, k: sample_batch_device(store, Kj, i, k, scfg))

    t0 = time.time()
    i = start
    while i < n_total:
        prev = i
        c = min(C - i % C, n_total - i)
        state, metrics = run_chunk(state, dd, jnp.asarray(i, jnp.int32), c)
        i += c

        def crossed(v: int) -> bool:
            """Interval hook fires when the chunk CROSSED a multiple of v,
            not only when a boundary lands exactly on one — a user-set
            scan_steps that does not divide the interval must not silently
            skip prints/checkpoints/eval renders."""
            return v > 0 and (i // v) > (prev // v)

        if (grid_update_fn is not None and i >= cfg.grid_warmup
                and crossed(cfg.i_grid)):
            gkey = jax.random.fold_in(jax.random.fold_in(base_key, i), 2)
            gbatch = sample_jit(dd, jnp.asarray(i, jnp.int32), gkey)
            grid, density_ema = grid_update_fn(
                state.params, gbatch, grid, density_ema)

        if crossed(cfg.i_print):
            loss = float(metrics["loss"])
            psnr = float(metrics["psnr"])
            rate = (i - start) / (time.time() - t0)
            print(f"[TRAIN] iter {i} loss {loss:.5f} psnr {psnr:.2f} "
                  f"it/s {rate:.2f}")
            logger.write(i, Loss=loss, PSNR=psnr)

        if crossed(cfg.i_weights):
            path = save_checkpoint(ckpt_dir, state, i)
            if grid is not None:
                save_grid(grid_path, grid, density_ema)
            logger.note(f"checkpoint saved: {path}")

        if crossed(cfg.i_testset) and len(ds.i_split[2]) > 0:
            _render_test_image(cfg, spec, state, ds, K, rng_eval, exp_dir,
                               i, uv_cache)

        if crossed(cfg.i_video):
            _render_orbit_video(cfg, spec, state, ds, rng_eval, exp_dir, i,
                                uv_cache)

    save_checkpoint(ckpt_dir, state, n_total)
    if grid is not None:
        save_grid(grid_path, grid, density_ema)
    logger.note("training finished")


def _render_orbit_video(cfg, spec, state, ds, rng, exp_dir, step, uv_cache):
    """Orbit render over `render_poses` (run_train.py's i_video hook over
    tools/load_facescape.py:87-88's spherical path). Writes frames; mp4 only
    when an ffmpeg-capable imageio backend exists."""
    import imageio.v2 as imageio

    from mofanerf_tpu.render.renderer import render_path

    train_i = int(rng.choice(ds.i_split[0]))
    pid = int(ds.id_codes[train_i])
    if pid not in uv_cache:
        uv_cache[pid] = read_image(ds.uv_paths[pid], is_uvmap=True,
                                   uv_size=spec.uv_size)
    tex = encode_texture(state.params, spec, jnp.asarray(uv_cache[pid]))
    cond = prepare_conditioning(
        state.params, spec, jnp.asarray(ds.shape_codes[train_i]),
        exp_code_for(state.params, int(ds.exp_types[train_i])), tex,
    )
    H, W, focal = ds.hwf
    rgbs, _ = render_path(
        state.params, spec, cond, ds.render_poses, (H, W, focal),
        render_factor=max(2, cfg.render_factor),
    )
    out_dir = os.path.join(exp_dir, f"video_{step:06d}")
    os.makedirs(out_dir, exist_ok=True)
    for k, rgb in enumerate(rgbs):
        imageio.imwrite(os.path.join(out_dir, f"{k:03d}.png"), to8b(rgb))
    try:
        imageio.mimwrite(os.path.join(out_dir, "orbit.mp4"), to8b(rgbs), fps=20)
    except Exception:
        pass


def _render_test_image(cfg, spec, state, ds, K, rng, exp_dir, step, uv_cache):
    """Half-res held-out render (run_train.py:382-398)."""
    import imageio.v2 as imageio

    test_i = int(rng.choice(ds.i_split[2]))
    pid = int(ds.id_codes[test_i])
    if pid not in uv_cache:
        uv_cache[pid] = read_image(ds.uv_paths[pid], is_uvmap=True,
                                   uv_size=spec.uv_size)
    tex = encode_texture(state.params, spec, jnp.asarray(uv_cache[pid]))
    cond = prepare_conditioning(
        state.params, spec, jnp.asarray(ds.shape_codes[test_i]),
        exp_code_for(state.params, int(ds.exp_types[test_i])), tex,
    )
    H, W, _ = ds.hwf
    out = render_frame(
        state.params, spec, cond, H // 2, W // 2,
        jnp.asarray(K / 2), jnp.asarray(ds.poses[test_i][:3]),
    )
    out_dir = os.path.join(exp_dir, f"testset_{step:06d}")
    os.makedirs(out_dir, exist_ok=True)
    imageio.imwrite(
        os.path.join(out_dir, f"{test_i:03d}.png"), to8b(np.asarray(out["rgb"]))
    )
