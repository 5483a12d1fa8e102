"""Device-resident data pipeline (data/device_data.py): build, in-graph
sampling semantics (precrop window, annealed bias, exact target gather),
and the scanned training driver end-to-end."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mofanerf_tpu.data.device_data import (
    DeviceSamplerConfig,
    build_device_dataset,
    estimate_device_bytes,
    sample_batch_device,
)
from mofanerf_tpu.data.facescape import (
    load_facescape_data, load_shape_codes, make_synthetic_dataset,
)


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd")
    make_synthetic_dataset(str(d), n_ids=2, n_train=3, n_test=1, hw=24)
    codes = load_shape_codes(str(d / "factors_id.npy"))
    ds = load_facescape_data(str(d), [0, 1], codes, uvdir=str(d / "uv"),
                             testskip=1)
    H, W, focal = ds.hwf
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    return d, ds, K


def test_build_shapes_and_uv_mapping(tiny_ds):
    _, ds, K = tiny_ds
    idx = ds.i_split[0]
    dd, bias = build_device_dataset(ds, K, idx, uv_size=32)
    n = len(idx)
    assert dd.images.shape == (n, 24, 24, 3) and dd.images.dtype == jnp.uint8
    assert dd.poses.shape == (n, 4, 4)
    assert dd.uv_maps.shape[0] == 2  # two identities
    assert bias in ("fg", "none")
    # uv_index routes each image to its identity's UV map
    for k, i in enumerate(np.asarray(idx)):
        assert int(dd.uv_index[k]) == int(ds.id_codes[i])
    # uint8 storage is exact for 8-bit source images
    from mofanerf_tpu.data.facescape import read_image

    img0 = read_image(ds.image_paths[int(idx[0])])
    np.testing.assert_allclose(
        np.asarray(dd.images[0], np.float32) / 255.0, img0, atol=1 / 510)


def test_sampler_precrop_and_gather(tiny_ds):
    _, ds, K = tiny_ds
    dd, bias = build_device_dataset(ds, K, ds.i_split[0], uv_size=32)
    scfg = DeviceSamplerConfig(
        n_rand=256, H=24, W=24, precrop_iters=10, precrop_frac=0.5,
        lm_frac=0.5, lm_frac_anneal_iters=0, bias=bias)
    key = jax.random.PRNGKey(0)

    # precrop phase: every ray inside the center half-box
    b = sample_batch_device(dd, jnp.asarray(K), jnp.asarray(2), key, scfg)
    assert b.rays_o.shape == (256, 3) and b.target_rgb.shape == (256, 3)
    # recover pixel coords from ray directions (get_rays_at inversion)
    dirs_cam = b.rays_d @ jnp.linalg.inv(
        dd.poses[0][:3, :3].T)  # may be any img; just bounds-check targets
    assert jnp.isfinite(b.rays_d).all()
    assert float(b.target_rgb.min()) >= 0.0
    assert float(b.target_rgb.max()) <= 1.0

    # post-precrop: targets must exactly equal gathered pixels of SOME
    # training image at integer coords — verify via brute-force match on a
    # distinctive sample row
    b2 = sample_batch_device(dd, jnp.asarray(K), jnp.asarray(50), key, scfg)
    imgs = np.asarray(dd.images, np.float32) / 255.0
    t0 = np.asarray(b2.target_rgb[0])
    assert min(np.abs(imgs[k] - t0).sum(-1).min() for k in
               range(imgs.shape[0])) < 1e-6


def test_sampler_landmark_bias(tiny_ds):
    _, ds, K = tiny_ds
    idx = ds.i_split[0]
    # synthetic landmarks: all at the world origin -> project near center
    lms = np.zeros((2, 20, 68, 3), np.float32)
    dd, bias = build_device_dataset(ds, K, idx, landmarks=lms, uv_size=32)
    assert bias == "landmarks"
    scfg = DeviceSamplerConfig(
        n_rand=512, H=24, W=24, precrop_iters=0, precrop_frac=0.5,
        lm_frac=1.0, lm_frac_anneal_iters=0, bias=bias)
    b = sample_batch_device(dd, jnp.asarray(K), jnp.asarray(100),
                            jax.random.PRNGKey(1), scfg)
    # rays through pixels near the projected center: recover coords by
    # re-projecting ray dirs; with lm_frac=1 nearly all samples should sit
    # within a few sigma (0.025*H) of the projected landmark
    # simpler: the projected origin lands near the image center for the
    # synthetic orbit cameras, so sampled target pixels cluster centrally.
    # We verify through the ray directions' angular spread being far below
    # the full-frame spread.
    d = b.rays_d / jnp.linalg.norm(b.rays_d, axis=-1, keepdims=True)
    spread = float(jnp.linalg.norm(d - d.mean(0), axis=-1).mean())
    scfg_uni = DeviceSamplerConfig(
        n_rand=512, H=24, W=24, precrop_iters=0, precrop_frac=0.5,
        lm_frac=0.0, lm_frac_anneal_iters=0, bias=bias)
    b_uni = sample_batch_device(dd, jnp.asarray(K), jnp.asarray(100),
                                jax.random.PRNGKey(1), scfg_uni)
    du = b_uni.rays_d / jnp.linalg.norm(b_uni.rays_d, axis=-1, keepdims=True)
    spread_uni = float(jnp.linalg.norm(du - du.mean(0), axis=-1).mean())
    assert spread < 0.5 * spread_uni, (spread, spread_uni)


def test_estimate_bytes_sane():
    assert estimate_device_bytes(1440, 128, 128) < 300 * 1024 * 1024


def test_train_device_data_e2e(tiny_ds, tmp_path):
    """The scanned device-data driver trains, logs, checkpoints, and
    resumes — mirroring test_train_loop's host-path coverage."""
    d, ds, K = tiny_ds
    from mofanerf_tpu.config import Config
    from mofanerf_tpu.train.loop import train

    cfg = Config(
        expname="dd_e2e", basedir=str(tmp_path), datadir=str(d),
        uvdir=str(d / "uv"), shape_codes_path=str(d / "factors_id.npy"),
        person_num=2, netdepth=2, netwidth=8, netdepth_fine=2,
        netwidth_fine=8, N_samples=4, N_importance=4, N_rand=64,
        precrop_iters=4, lm_frac_anneal_iters=8, compute_dtype="float32",
        uv_size=128, packet_size=256, i_print=10, i_weights=20,
        i_testset=10 ** 9,
        i_video=10 ** 9, i_grid=10, grid_warmup=10, grid_resolution=8,
        device_data=True, scan_steps=5, testskip=1,
    )
    train(cfg, n_iters=20)
    ckpt_dir = os.path.join(str(tmp_path), "dd_e2e", "checkpoints")
    from mofanerf_tpu.train.checkpoint import latest_step

    assert latest_step(ckpt_dir) == 20
    assert os.path.exists(os.path.join(ckpt_dir, "occupancy_grid.npz"))
    log = open(os.path.join(str(tmp_path), "dd_e2e", "train_log.txt")).read()
    assert "iteration: 10" in log or "10" in log
    # resume continues from the checkpoint
    train(cfg, n_iters=25)
    assert latest_step(ckpt_dir) == 25


def test_white_bkgd_compositing(tiny_ds, tmp_path):
    """white_bkgd composites RGBA sources over white in the device store
    (regression: a black background lets an opaque black-fog 'curtain'
    match the data with no 3D structure — observed at flagship dims)."""
    import dataclasses
    import imageio.v2 as imageio

    _, ds, K = tiny_ds
    rgba = np.zeros((24, 24, 4), np.uint8)
    rgba[6:18, 6:18] = (200, 100, 50, 255)  # opaque square, transparent bg
    p = str(tmp_path / "rgba.png")
    imageio.imwrite(p, rgba)
    ds2 = dataclasses.replace(
        ds, image_paths={int(ds.i_split[0][0]): p, **{
            int(i): ds.image_paths[int(i)] for i in ds.i_split[0][1:]}})

    idx = ds.i_split[0]
    dd_b, _ = build_device_dataset(ds2, K, idx, uv_size=32)
    dd_w, _ = build_device_dataset(ds2, K, idx, uv_size=32, white_bkgd=True)
    assert (np.asarray(dd_b.images[0][0, 0]) == 0).all()
    assert (np.asarray(dd_w.images[0][0, 0]) == 255).all()
    # foreground pixels identical in both modes
    np.testing.assert_array_equal(np.asarray(dd_b.images[0][12, 12]),
                                  np.asarray(dd_w.images[0][12, 12]))


def test_fg_mask_sources(tmp_path):
    """_fg_mask prefers the source alpha; falls back to brightness only on
    black backgrounds; yields None (-> bias degrades to 'none') when the
    composited-white image is all that exists (ADVICE r3)."""
    import imageio.v2 as imageio

    from mofanerf_tpu.data.device_data import _fg_mask

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[2:6, 2:6] = [200, 100, 50, 255]
    p_rgba = str(tmp_path / "a.png")
    p_rgb = str(tmp_path / "b.png")
    imageio.imwrite(p_rgba, rgba)
    imageio.imwrite(p_rgb, rgba[..., :3])

    white_comp = np.ones((8, 8, 3), np.float32)
    m = _fg_mask(p_rgba, white_comp, half_res=False, white_bkgd=True)
    assert m is not None and int(m.sum()) == 16
    assert _fg_mask(p_rgb, white_comp, half_res=False, white_bkgd=True) is None
    m3 = _fg_mask(p_rgb, rgba[..., :3].astype(np.float32) / 255.0,
                  half_res=False, white_bkgd=False)
    assert m3 is not None and int(m3.sum()) == 16


def test_sampler_landmark_coords_integer(tiny_ds):
    """Landmark-biased rays must go through INTEGER pixel coords so the ray
    and the gathered supervision pixel agree (ADVICE r3: the continuous
    jittered coords gave up to ~1 px misalignment)."""
    _, ds, K = tiny_ds
    idx = ds.i_split[0]
    lms = np.zeros((2, 20, 68, 3), np.float32)
    dd, bias = build_device_dataset(ds, K, idx, landmarks=lms, uv_size=32)
    scfg = DeviceSamplerConfig(
        n_rand=256, H=24, W=24, precrop_iters=0, precrop_frac=0.5,
        lm_frac=1.0, lm_frac_anneal_iters=0, bias=bias)
    b = sample_batch_device(dd, jnp.asarray(K), jnp.asarray(100),
                            jax.random.PRNGKey(2), scfg)
    # recover (row, col) from each ray dir: invert get_rays_at for the pose
    # used; cheaper: every target must exactly equal a stored pixel (integer
    # gather on integer coords)
    imgs = np.asarray(dd.images, np.float32) / 255.0
    flat = imgs.reshape(-1, 3)
    t = np.asarray(b.target_rgb)
    for row in t[:16]:
        assert np.abs(flat - row).sum(-1).min() < 1e-6


def test_device_loop_interval_crossing(tiny_ds, tmp_path):
    """scan_steps that do NOT divide i_weights must still produce the
    intermediate checkpoints (hooks fire on boundary CROSSINGS, not exact
    multiples — ADVICE r3 medium)."""
    d, ds, K = tiny_ds
    from mofanerf_tpu.config import Config
    from mofanerf_tpu.train.loop import train
    from mofanerf_tpu.train.checkpoint import latest_step

    cfg = Config(
        expname="dd_cross", basedir=str(tmp_path), datadir=str(d),
        uvdir=str(d / "uv"), shape_codes_path=str(d / "factors_id.npy"),
        person_num=2, netdepth=2, netwidth=8, netdepth_fine=2,
        netwidth_fine=8, N_samples=4, N_importance=4, N_rand=64,
        precrop_iters=4, lm_frac_anneal_iters=8, compute_dtype="float32",
        uv_size=128, packet_size=256, i_print=10, i_weights=10,
        i_testset=10 ** 9, i_video=10 ** 9, i_grid=0,
        device_data=True, scan_steps=7, testskip=1,
    )
    train(cfg, n_iters=20)
    ckpt_dir = os.path.join(str(tmp_path), "dd_cross", "checkpoints")
    assert latest_step(ckpt_dir) == 20
    # the i=14 chunk boundary crossed the 10-multiple: an intermediate
    # checkpoint must exist (round-3 code skipped ALL of them)
    steps = sorted(int(s) for s in os.listdir(ckpt_dir) if s.isdigit())
    assert any(s < 20 for s in steps), steps


def test_expdelta_reservoir_concentrates_on_differences(tmp_path):
    """bias_override='expdelta': reservoir pixels must concentrate where
    same-pose frames differ across expressions (the mouth patch here), so
    the biased rays carry expression-discriminative gradient."""
    import imageio.v2 as imageio
    from types import SimpleNamespace

    H = W = 32
    base = np.full((H, W, 3), 128, np.uint8)
    a = base.copy()
    b = base.copy()
    b[20:26, 10:22] = 250  # the "mouth" differs between the two expressions
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    imageio.imwrite(pa, a)
    imageio.imwrite(pb, b)
    pose = np.eye(4, dtype=np.float32)
    ds = SimpleNamespace(
        image_paths=[pa, pb],
        poses=np.stack([pose, pose]),
        id_codes=np.zeros(2, np.int32),
        exp_types=np.arange(2, dtype=np.int32),
        shape_codes=np.zeros((2, 50), np.float32),
        uv_paths={},
        hwf=(H, W, 30.0),
    )
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    dd, bias = build_device_dataset(
        ds, K, np.arange(2), uv_size=16, fg_reservoir=256,
        bias_override="expdelta")
    assert bias == "fg"  # reservoir semantics, sampler unchanged
    res = np.asarray(dd.fg_pixels)
    for k in range(2):
        rows, cols = res[k, :, 0], res[k, :, 1]
        inside = ((rows >= 20) & (rows < 26) & (cols >= 10) & (cols < 22))
        assert inside.mean() > 0.95, f"frame {k}: reservoir not concentrated"


def test_expdelta_single_expression_degrades_to_none(tmp_path):
    import imageio.v2 as imageio
    from types import SimpleNamespace

    H = W = 16
    p = str(tmp_path / "solo.png")
    imageio.imwrite(p, np.full((H, W, 3), 90, np.uint8))
    ds = SimpleNamespace(
        image_paths=[p], poses=np.eye(4, dtype=np.float32)[None],
        id_codes=np.zeros(1, np.int32), exp_types=np.zeros(1, np.int32),
        shape_codes=np.zeros((1, 50), np.float32),
        uv_paths={}, hwf=(H, W, 30.0),
    )
    K = np.array([[30.0, 0, 8], [0, 30.0, 8], [0, 0, 1]], np.float32)
    _, bias = build_device_dataset(ds, K, np.arange(1), uv_size=8,
                                   fg_reservoir=64, bias_override="expdelta")
    assert bias == "none"
