import numpy as np
import pytest

from mofanerf_tpu.data.facescape import (
    load_facescape_data,
    make_synthetic_dataset,
    read_image,
    valid_persons,
)
from mofanerf_tpu.data.landmarks import (
    FitRaySampler,
    TrainRaySampler,
    project_landmarks,
)
from mofanerf_tpu.ops.rays import pose_spherical, get_rays


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("facescape")
    persons = make_synthetic_dataset(str(d), n_ids=2, n_train=3, n_test=2, hw=16)
    return str(d), persons


def test_synthetic_roundtrip(synth):
    d, persons = synth
    assert valid_persons(d) == persons
    shape_codes = np.load(f"{d}/factors_id.npy")
    ds = load_facescape_data(d, persons, shape_codes, uvdir=f"{d}/uv")
    n_train = 2 * 3
    assert len(ds.i_split[0]) == n_train
    assert len(ds.i_split[1]) == 2 * 2
    assert ds.poses.shape[1:] == (4, 4)
    assert ds.shape_codes.shape[1] == 50
    assert ds.hwf[0] == 16
    assert ds.render_poses.shape == (40, 4, 4)
    assert set(ds.uv_paths) == set(persons)


def test_read_image_formats(synth):
    d, persons = synth
    shape_codes = np.load(f"{d}/factors_id.npy")
    ds = load_facescape_data(d, persons, shape_codes)
    img = read_image(ds.image_paths[0])
    assert img.dtype == np.float32 and img.shape == (16, 16, 3)
    assert 0 <= img.min() and img.max() <= 1
    half = read_image(ds.image_paths[0], half_res=True)
    assert half.shape == (8, 8, 3)
    uv = read_image(ds.image_paths[0], is_uvmap=True, uv_size=32)
    assert uv.shape == (32, 32, 3)


def test_project_landmarks_consistent_with_rays():
    """A landmark projected to pixel (r, c) must lie on the ray through
    that pixel."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    c2w = pose_spherical(25.0, -15.0, 16.0)
    rng = np.random.default_rng(0)
    lm3d = rng.uniform(-1, 1, (68, 3))
    lm2d = project_landmarks(lm3d, K, c2w)
    ro, rd = get_rays(64, 64, K, c2w[:3])
    for idx in [0, 17, 40]:
        r, c = lm2d[idx]
        if not (0 <= r < 63 and 0 <= c < 63):
            continue
        ri, ci = int(round(r)), int(round(c))
        d = np.asarray(rd[ri, ci])
        o = np.asarray(ro[ri, ci])
        v = lm3d[idx] - o
        cos = v @ d / (np.linalg.norm(v) * np.linalg.norm(d))
        assert cos > 0.999, f"landmark {idx} off its pixel ray (cos={cos})"


def test_train_sampler_biased_near_landmarks():
    H = W = 64
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    pose = pose_spherical(0.0, 0.0, 16.0)
    lm = np.zeros((1, 1, 68, 3))  # all landmarks at origin -> project near center
    s = TrainRaySampler(lm, H, W)
    rng = np.random.default_rng(1)
    coords = s.sample(rng, 1000, K, pose, 0, 0)
    assert coords.shape == (1000, 2)
    assert coords.min() >= 0 and coords.max() < 64
    center_frac = (
        (np.abs(coords[:, 0] - 32) < 8) & (np.abs(coords[:, 1] - 32) < 8)
    ).mean()
    assert center_frac > 0.4, f"landmark bias missing: {center_frac}"


def test_train_sampler_uniform_fallback_and_precrop():
    s = TrainRaySampler(None, 64, 64)
    rng = np.random.default_rng(2)
    coords = s.sample(rng, 500, None, None, 0, 0)
    assert coords.shape == (500, 2)
    c2 = s.sample(rng, 500, None, None, 0, 0, precrop_frac=0.5)
    assert c2[:, 0].min() >= 16 and c2[:, 0].max() < 48


def test_fit_sampler_on_face_filter():
    H = 64
    kp = np.full((68, 2), 32.0)
    s = FitRaySampler(kp, H)
    target = np.zeros((64, 64, 3), np.float32)
    target[24:40, 24:40] = 0.5  # face region
    rng = np.random.default_rng(3)
    coords = s.sample(rng, 256, scale=1, target_img=target)
    assert coords.shape == (256, 2)
    on_face = (target.sum(2)[coords[:, 0], coords[:, 1]] != 0).mean()
    assert on_face > 0.8, f"too many off-face samples: {on_face}"


def test_fit_sampler_scales():
    kp = np.full((68, 2), 256.0)
    s = FitRaySampler(kp, 512)
    rng = np.random.default_rng(4)
    for scale in [8, 4, 2, 1]:
        coords = s.sample(rng, 128, scale=scale)
        side = 512 // scale
        assert coords.max() < side and coords.min() >= 0


def test_train_sampler_foreground_fallback():
    """Without landmarks but WITH a target image, sampling must bias to
    foreground pixels (prevents density collapse on sparse objects)."""
    s = TrainRaySampler(None, 64, 64)
    rng = np.random.default_rng(5)
    target = np.zeros((64, 64, 3), np.float32)
    target[20:40, 20:40] = 0.8  # small foreground square
    coords = s.sample(rng, 1000, None, None, 0, 0, target_img=target)
    assert coords.shape == (1000, 2)
    fg = ((coords[:, 0] >= 20) & (coords[:, 0] < 40)
          & (coords[:, 1] >= 20) & (coords[:, 1] < 40)).mean()
    assert fg > 0.5, f"foreground bias missing: {fg}"
    # black target -> falls back to uniform without crashing
    c2 = s.sample(rng, 100, None, None, 0, 0, target_img=np.zeros((64, 64, 3)))
    assert c2.shape == (100, 2)


def test_anneal_lm_frac_schedule():
    from mofanerf_tpu.data.landmarks import anneal_lm_frac

    assert anneal_lm_frac(0, 0.6, 1000) == 0.0
    assert abs(anneal_lm_frac(500, 0.6, 1000) - 0.3) < 1e-9
    assert anneal_lm_frac(1000, 0.6, 1000) == 0.6
    assert anneal_lm_frac(99999, 0.6, 1000) == 0.6
    # disabled anneal jumps straight to the target
    assert anneal_lm_frac(0, 0.6, 0) == 0.6


def test_train_sampler_lm_frac_override():
    """lm_frac=0 (anneal start) must yield a pure-uniform draw even with
    landmarks present; lm_frac near 1 concentrates on them."""
    H = W = 64
    lm = np.zeros((1, 1, 68, 3), np.float32)  # all landmarks at the origin
    K = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
    pose = np.asarray(pose_spherical(0.0, 0.0, 4.0))
    s = TrainRaySampler(lm, H, W, lm_frac=0.6)
    rng = np.random.default_rng(7)

    c0 = s.sample(rng, 1000, K, pose, 0, 0, lm_frac=0.0)
    center0 = ((np.abs(c0[:, 0] - 32) < 8) & (np.abs(c0[:, 1] - 32) < 8)).mean()
    assert center0 < 0.15, f"lm_frac=0 should be uniform, got center {center0}"

    c1 = s.sample(rng, 1000, K, pose, 0, 0, lm_frac=0.95)
    center1 = ((np.abs(c1[:, 0] - 32) < 8) & (np.abs(c1[:, 1] - 32) < 8)).mean()
    assert center1 > 0.7, f"lm_frac=0.95 should concentrate, got {center1}"
