"""Device-resident training data + in-graph batch sampling.

The reference's per-step data path is host-side: pick a random image, read
it from disk, landmark-bias the pixel selection, gather targets, ship the
batch (run_train.py:335, 119-148). That is the right shape for a GPU box
with many CPU cores; on a TPU host with ONE core it becomes the wall — the
measured flagship morphable run trains at ~3.3 it/s host-bound vs 7.6 it/s
with in-memory batches, and every step pays a host->device transfer plus a
dispatch round-trip through the remote runtime.

This module moves the ENTIRE per-step pipeline into the compiled graph:

- the training split (images as uint8, poses, codes, UV maps, projected
  landmark pixels / foreground-pixel reservoirs) lives in HBM once,
- pixel selection (center precrop, annealed landmark bias, uniform fill)
  is branchless `jax.random` sampling — iteration-dependent behavior is
  arithmetic on traced scalars, never Python control flow, so ONE program
  covers the whole schedule,
- the train loop scans `scan_steps` optimizer steps per dispatch
  (train/loop.py), amortizing the runtime round-trip that dominates when
  each step is only tens of milliseconds.

Semantics vs the host sampler (data/landmarks.py::TrainRaySampler),
deliberate and documented:
- the landmark/foreground-biased fraction is an expected fraction (per-ray
  Bernoulli(frac)) rather than an exact count — same distribution target,
  branchless;
- foreground bias uses a fixed-size per-image reservoir of foreground
  pixels sampled once at build time (with replacement) instead of
  re-scanning the mask per step;
- the PRNG stream differs from the host path (host numpy vs JAX threefry).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.data.facescape import read_image
from mofanerf_tpu.data.landmarks import project_landmarks
from mofanerf_tpu.ops.rays import get_rays_at
from mofanerf_tpu.train.state import Batch


class DeviceDataset(NamedTuple):
    """Training split, resident in device memory. `bias` (a static string
    carried separately) selects how the biased fraction of rays is drawn:
    'landmarks' -> gaussian clouds around `lm2d`; 'fg' -> draws from
    `fg_pixels`; 'none' -> uniform only."""

    images: jnp.ndarray       # [N, H, W, 3] uint8
    poses: jnp.ndarray        # [N, 4, 4] f32
    shape_codes: jnp.ndarray  # [N, shape_dim] f32
    exp_types: jnp.ndarray    # [N] int32
    uv_maps: jnp.ndarray      # [P, S, S, 3] f32
    uv_index: jnp.ndarray     # [N] int32 image -> uv_maps row
    lm2d: jnp.ndarray         # [N, 68, 2] f32 projected (row, col) pixels
    fg_pixels: jnp.ndarray    # [N, F, 2] int32 foreground reservoir


@dataclasses.dataclass(frozen=True)
class DeviceSamplerConfig:
    """Static sampling parameters (baked into the compiled program)."""

    n_rand: int
    H: int
    W: int
    precrop_iters: int
    precrop_frac: float
    lm_frac: float
    lm_frac_anneal_iters: int
    bias: str                 # 'landmarks' | 'fg' | 'none'


def estimate_device_bytes(n_images: int, H: int, W: int,
                          n_uv: int = 8, uv_size: int = 512,
                          fg_reservoir: int = 2048) -> int:
    """Rough device-memory footprint of a DeviceDataset."""
    return (n_images * H * W * 3                       # uint8 images
            + n_images * (16 * 4 + 68 * 2 * 4 + fg_reservoir * 2 * 4 + 64)
            + n_uv * uv_size * uv_size * 3 * 4)


def _fg_mask(path: str, img: np.ndarray, half_res: bool,
             white_bkgd: bool) -> Optional[np.ndarray]:
    """Foreground mask for the fg-bias reservoir. Prefers the source alpha
    channel (RGBA dataset frames); falls back to a brightness threshold on
    the composited RGB only when that threshold is meaningful (black
    background). Returns None when no usable mask exists — the caller then
    degrades to bias='none' (logged by the train loop) instead of silently
    baking a uniform reservoir."""
    import imageio.v2 as imageio

    raw = np.asarray(imageio.imread(path))
    if raw.ndim == 3 and raw.shape[-1] == 4:
        a = raw[..., 3].astype(np.float32) / 255.0
        if half_res:
            import cv2

            a = cv2.resize(a, (a.shape[1] // 2, a.shape[0] // 2),
                           interpolation=cv2.INTER_AREA)
        return a > 0.02
    if not white_bkgd:
        return img.sum(-1) > 0.02
    return None


def _expdelta_reservoirs(ds, idx, imgs, W, fg_reservoir, rng):
    """Per-image reservoirs of EXPRESSION-INFORMATIVE pixels.

    Groups the split by (identity, camera pose) — the synthetic sets render
    every expression at shared view poses — and, for each frame, samples
    reservoir pixels with probability proportional to the frame's max
    per-pixel difference from its same-pose siblings under other
    expressions. Uniform ray sampling starves the expression codes: the
    pixels that distinguish expressions (mouth, brows, silhouette shifts)
    are a few percent of a face frame, so at the reference lr the codes
    barely move (measured: a 20x20 code-vs-GT transfer matrix at 60k iters
    had positive own-expression margins on only ~5/20 rows). Returns
    (fg array, any_filled)."""
    groups = {}
    for k, i in enumerate(idx):
        key = (int(ds.id_codes[int(i)]),
               np.round(np.asarray(ds.poses[int(i)][:3]), 5).tobytes())
        groups.setdefault(key, []).append(k)
    fg = np.zeros((len(idx), fg_reservoir, 2), np.int32)
    filled = False
    for ks in groups.values():
        if len(ks) < 2:
            continue
        stack = np.stack([imgs[k].astype(np.float32) for k in ks])
        for a_pos, k in enumerate(ks):
            delta = np.abs(stack - stack[a_pos]).mean(-1).max(0).reshape(-1)
            s = float(delta.sum())
            if s <= 0.0:
                continue
            pick = rng.choice(delta.shape[0], size=fg_reservoir,
                              p=delta / s)
            fg[k, :, 0] = pick // W
            fg[k, :, 1] = pick % W
            filled = True
    return fg, filled


def build_device_dataset(
    ds,                              # data.facescape.FacescapeDataset
    K: np.ndarray,
    indices: np.ndarray,             # images to include (the train split)
    landmarks: Optional[np.ndarray] = None,  # [n_ids, n_exps, 68, 3] world
    uv_size: int = 512,
    fg_reservoir: int = 2048,
    half_res: bool = False,
    white_bkgd: bool = False,
    seed: int = 0,
    bias_override: Optional[str] = None,  # None/'auto' | 'expdelta' | 'fg' | 'landmarks' | 'none'
):
    """Read the split once on the host and place it on device. Returns
    (DeviceDataset, bias_mode). Costs one pass over the images — afterwards
    training never touches the filesystem."""
    rng = np.random.default_rng(seed)
    idx = np.asarray(indices, np.int64)
    n = len(idx)
    imgs = []
    fg = np.zeros((n, fg_reservoir, 2), np.int32)
    lm2d = np.zeros((n, 68, 2), np.float32)
    if bias_override in (None, "auto"):
        bias = "landmarks" if landmarks is not None else "fg"
    else:
        bias = bias_override
        if bias == "landmarks" and landmarks is None:
            raise ValueError("bias_override='landmarks' but no landmarks given")
    has_fg = False
    for k, i in enumerate(idx):
        img = read_image(ds.image_paths[int(i)], half_res=half_res,
                         white_bkgd=white_bkgd)
        imgs.append(np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8))
        if landmarks is not None:
            lm3 = landmarks[int(ds.id_codes[i]), int(ds.exp_types[i])]
            lm2d[k] = project_landmarks(lm3, K, ds.poses[int(i)]).astype(
                np.float32)
        else:
            # foreground mask: the source alpha channel when available —
            # thresholding the white-composited RGB would pass EVERY pixel
            # under white_bkgd and silently bake a uniform reservoir
            mask = _fg_mask(ds.image_paths[int(i)], img, half_res,
                            white_bkgd)
            if mask is not None:
                r, c = np.nonzero(mask)
                if r.shape[0] > 0:
                    pick = rng.integers(0, r.shape[0], fg_reservoir)
                    fg[k, :, 0] = r[pick]
                    fg[k, :, 1] = c[pick]
                    has_fg = True
    if bias == "expdelta":
        H_, W_ = imgs[0].shape[:2]
        fg, filled = _expdelta_reservoirs(ds, idx, imgs, W_, fg_reservoir, rng)
        # reservoir semantics are identical to the fg mode from here on —
        # the in-graph sampler needs no new branch
        bias = "fg" if filled else "none"
    elif bias == "fg" and not has_fg:
        bias = "none"

    H, W = imgs[0].shape[:2]
    persons = sorted({int(ds.id_codes[i]) for i in idx})
    slot = {p: s for s, p in enumerate(persons)}
    uv_maps = np.zeros((len(persons), uv_size, uv_size, 3), np.float32)
    for p, s in slot.items():
        if p in ds.uv_paths:
            uv_maps[s] = read_image(ds.uv_paths[p], is_uvmap=True,
                                    uv_size=uv_size)
    uv_index = np.asarray([slot[int(ds.id_codes[i])] for i in idx], np.int32)

    dd = DeviceDataset(
        images=jnp.asarray(np.stack(imgs)),
        poses=jnp.asarray(ds.poses[idx].astype(np.float32)),
        shape_codes=jnp.asarray(ds.shape_codes[idx].astype(np.float32)),
        exp_types=jnp.asarray(ds.exp_types[idx].astype(np.int32)),
        uv_maps=jnp.asarray(uv_maps),
        uv_index=jnp.asarray(uv_index),
        lm2d=jnp.asarray(lm2d),
        fg_pixels=jnp.asarray(fg),
    )
    return dd, bias


def sample_batch_device(
    dd: DeviceDataset,
    K: jnp.ndarray,
    i: jnp.ndarray,            # traced iteration counter (scalar int32)
    key: jax.Array,
    scfg: DeviceSamplerConfig,
) -> Batch:
    """Draw one training batch entirely in-graph. Branchless equivalent of
    TrainRaySampler.sample + make_batch (train/loop.py): precrop window for
    the first precrop_iters, annealed biased fraction afterwards, uniform
    fill; rays at the selected pixel coords; targets gathered from the
    uint8 image; conditioning rows indexed per image."""
    n = scfg.n_rand
    H, W = scfg.H, scfg.W
    k_img, k_box, k_pick, k_jit, k_mask = jax.random.split(key, 5)

    img_i = jax.random.randint(k_img, (), 0, dd.images.shape[0])
    fi = i.astype(jnp.float32)

    # precrop window (full frame once i >= precrop_iters)
    active = fi < scfg.precrop_iters
    dH = H // 2 * scfg.precrop_frac
    dW = W // 2 * scfg.precrop_frac
    lo_r = jnp.where(active, H / 2 - dH, 0.0)
    hi_r = jnp.where(active, H / 2 + dH, float(H))
    lo_c = jnp.where(active, W / 2 - dW, 0.0)
    hi_c = jnp.where(active, W / 2 + dW, float(W))
    u = jax.random.uniform(k_box, (n, 2))
    rows_u = jnp.floor(lo_r + u[:, 0] * (hi_r - lo_r))
    cols_u = jnp.floor(lo_c + u[:, 1] * (hi_c - lo_c))

    # biased samples (annealed fraction; zero while precrop is active —
    # matching the host sampler, which returns the precrop box alone)
    if scfg.lm_frac_anneal_iters > 0:
        frac = scfg.lm_frac * jnp.clip(fi / scfg.lm_frac_anneal_iters, 0, 1)
    else:
        frac = jnp.asarray(scfg.lm_frac, jnp.float32)
    frac = jnp.where(active, 0.0, frac)

    if scfg.bias == "landmarks":
        lm = dd.lm2d[img_i]                                   # [68, 2]
        li = jax.random.randint(k_pick, (n,), 0, lm.shape[0])
        pts = lm[li] + jax.random.normal(k_jit, (n, 2)) * (0.025 * H)
        rows_b, cols_b = pts[:, 0], pts[:, 1]
    elif scfg.bias == "fg":
        res = dd.fg_pixels[img_i]                             # [F, 2]
        li = jax.random.randint(k_pick, (n,), 0, res.shape[0])
        picked = res[li].astype(jnp.float32)
        rows_b, cols_b = picked[:, 0], picked[:, 1]
    else:
        rows_b, cols_b = rows_u, cols_u

    use_b = jax.random.uniform(k_mask, (n,)) < frac
    # floor BEFORE ray generation so the ray and the gathered supervision
    # pixel agree exactly (the host TrainRaySampler casts to int before
    # both; the landmark-biased branch produces continuous coords)
    rows = jnp.floor(jnp.clip(jnp.where(use_b, rows_b, rows_u), 0, H - 1))
    cols = jnp.floor(jnp.clip(jnp.where(use_b, cols_b, cols_u), 0, W - 1))
    coords = jnp.stack([rows, cols], axis=-1)

    pose = dd.poses[img_i]
    rays_o, rays_d = get_rays_at(coords, K, pose)
    img = dd.images[img_i]                                    # [H, W, 3] u8
    tgt = img[rows.astype(jnp.int32), cols.astype(jnp.int32)]
    return Batch(
        rays_o=rays_o,
        rays_d=rays_d,
        target_rgb=tgt.astype(jnp.float32) / 255.0,
        shape_code=dd.shape_codes[img_i],
        exp_type=dd.exp_types[img_i],
        uv_map=dd.uv_maps[dd.uv_index[img_i]],
    )
