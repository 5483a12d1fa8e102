import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mofanerf_tpu.preprocess.align import (
    CANONICAL_LANDMARKS_512,
    procrustes_similarity,
    align_to_template,
    PrecomputedLandmarkSource,
)
from mofanerf_tpu.preprocess.pose import (
    rodrigues,
    fit_pose_orthographic,
    pose_to_c2w,
    estimate_pose_from_kp,
    _project_ortho,
)
from mofanerf_tpu.preprocess.matting import hull_mask, apply_mask
from mofanerf_tpu.preprocess.sh import sh_basis, sh_shading


def test_procrustes_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 512, (68, 2))
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    s, t = 1.7, np.array([30.0, -12.0])
    dst = s * src @ R.T + t
    M = procrustes_similarity(src, dst)
    got = np.concatenate([src, np.ones((68, 1))], 1) @ M.T
    np.testing.assert_allclose(got, dst, atol=1e-6)


def test_align_to_template_moves_landmarks():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (300, 400, 3)).astype(np.float32)
    # synthetic detected landmarks: template shrunk + shifted
    kp = CANONICAL_LANDMARKS_512 * 0.5 + np.array([40, 20])
    aligned, warped = align_to_template(img, kp)
    assert aligned.shape == (512, 512, 3)
    np.testing.assert_allclose(warped, CANONICAL_LANDMARKS_512, atol=0.5)


def test_rodrigues_properties():
    rng = np.random.default_rng(2)
    rv = rng.standard_normal(3) * 0.7
    R = rodrigues(rv)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
    np.testing.assert_allclose(rodrigues(np.zeros(3)), np.eye(3))


def test_pose_fit_recovers_synthetic_camera():
    rng = np.random.default_rng(3)
    lm3d = rng.uniform(-1, 1, (68, 3))
    rv_true = np.array([0.1, -0.35, 0.12])
    R_true = rodrigues(rv_true)
    s_true, t_true = 110.0, np.array([250.0, 260.0])
    kp2d = _project_ortho(lm3d, s_true, t_true, R_true)

    s, t, R, resid = fit_pose_orthographic(kp2d, lm3d)
    assert resid < 1e-3, resid
    np.testing.assert_allclose(s, s_true, rtol=1e-3)
    np.testing.assert_allclose(t, t_true, atol=0.5)
    np.testing.assert_allclose(R, R_true, atol=1e-3)


def test_pose_to_c2w_reprojects():
    """The perspective camera built from the orthographic fit must put the
    landmarks near their detected pixels when projected with K."""
    from mofanerf_tpu.data.landmarks import project_landmarks

    rng = np.random.default_rng(4)
    lm3d = rng.uniform(-1, 1, (68, 3))
    rv = np.array([0.05, 0.2, -0.1])
    s_true, t_true = 100.0, np.array([256.0, 250.0])
    kp2d = _project_ortho(lm3d, s_true, t_true, rodrigues(rv))

    c2w, resid = estimate_pose_from_kp(kp2d, lm3d, focal=1200.0, img_size=512)
    K = np.array([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1]])
    proj_rc = project_landmarks(lm3d, K, c2w)  # (row, col)
    proj_xy = proj_rc[:, ::-1]
    err = np.abs(proj_xy - kp2d).mean()
    # perspective vs orthographic differ by depth foreshortening; a loose
    # bound still catches wrong-frame/sign errors (which give ~100s of px)
    assert err < 12.0, err


def test_hull_mask():
    kp = np.array([[10, 10], [50, 10], [50, 50], [10, 50]], np.float64)
    m = hull_mask((64, 64), kp)
    assert m[30, 30] == 1 and m[5, 5] == 0
    img = np.ones((64, 64, 3), np.float32)
    out = apply_mask(img, m)
    assert out[30, 30, 0] == 1 and out[5, 5, 0] == 0


def test_sh_constant_light():
    n = np.array([[0, 0, 1.0], [0, 1.0, 0], [1.0, 0, 0]])
    sh = np.zeros(9)
    sh[0] = 1.0
    shading = sh_shading(n, sh)
    # constant term: same shading for all normals
    np.testing.assert_allclose(shading, shading[0])
    assert shading[0] > 0


def test_sh_matches_dpr():
    """Elementwise oracle vs the reference DPR basis
    (tools/fit_data_pre/utils/utils_SH.py:7-35): order
    (1, Y, Z, X, YX, YZ, 3Z^2-1, XZ, X^2-Y^2), all-positive coefficients,
    attenuation pi*[1, 2/3, 1/4]. Coefficients produced under the reference
    convention (fcspLight.npy et al.) must reconstruct identical shading."""
    rng = np.random.default_rng(3)
    n = rng.normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    x, y, z = n[:, 0], n[:, 1], n[:, 2]
    att = np.pi * np.array([1, 2.0 / 3.0, 1 / 4.0])
    ref = np.stack(
        [
            0.5 / np.sqrt(np.pi) * att[0] * np.ones_like(x),
            np.sqrt(3) / 2 / np.sqrt(np.pi) * y * att[1],
            np.sqrt(3) / 2 / np.sqrt(np.pi) * z * att[1],
            np.sqrt(3) / 2 / np.sqrt(np.pi) * x * att[1],
            np.sqrt(15) / 2 / np.sqrt(np.pi) * y * x * att[2],
            np.sqrt(15) / 2 / np.sqrt(np.pi) * y * z * att[2],
            np.sqrt(5) / 4 / np.sqrt(np.pi) * (3 * z ** 2 - 1) * att[2],
            np.sqrt(15) / 2 / np.sqrt(np.pi) * x * z * att[2],
            np.sqrt(15) / 4 / np.sqrt(np.pi) * (x ** 2 - y ** 2) * att[2],
        ],
        axis=1,
    )
    np.testing.assert_allclose(sh_basis(n), ref, rtol=0, atol=1e-12)


def test_sh_directional_z():
    sh = np.zeros(9)
    sh[2] = 1.0  # z band
    up = sh_shading(np.array([[0, 0, 1.0]]), sh)[0]
    down = sh_shading(np.array([[0, 0, -1.0]]), sh)[0]
    assert up > 0 > down


def test_bisenet_shapes():
    from mofanerf_tpu.preprocess.segment import BiSeNet, segment_face

    net = BiSeNet()
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 64, 19)
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    parse = segment_face(img, variables)
    assert parse.shape == (64, 64)
    assert parse.max() < 19


def test_hourglass_shapes_and_light():
    from mofanerf_tpu.preprocess.relight import HourglassNet, NC_OUT_LIGHT

    net = HourglassNet()
    x = jnp.zeros((1, 64, 64, 1))
    tl = jnp.zeros((1, 1, 1, 9))
    variables = net.init(jax.random.PRNGKey(0), x, tl)
    out, light = net.apply(variables, x, tl)
    assert out.shape == (1, 64, 64, 1)
    assert light.shape[-1] == NC_OUT_LIGHT
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # sigmoid


def test_relight_roundtrip_shapes():
    from mofanerf_tpu.preprocess.relight import HourglassNet, relight_to_canonical

    net = HourglassNet()
    x = jnp.zeros((1, 64, 64, 1))
    tl = jnp.zeros((1, 1, 1, 9))
    variables = net.init(jax.random.PRNGKey(1), x, tl)
    img = np.random.default_rng(1).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    relit, src_sh = relight_to_canonical(img, variables, np.zeros(9), size=64)
    assert relit.shape == (64, 64, 3)
    assert src_sh.shape == (9,)


def test_pipeline_e2e_fallbacks(tmp_path):
    """Full 4-stage pipeline with precomputed landmarks, no NN weights."""
    import imageio.v2 as imageio
    from mofanerf_tpu.preprocess.pipeline import preprocess_dir

    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 255, (512, 512, 3))).astype(np.uint8)
    imageio.imwrite(str(tmp_path / "1.png"), img)
    kp = CANONICAL_LANDMARKS_512[:, ::-1]  # (row, col)
    np.save(str(tmp_path / "kp_1.npy"), kp)
    lm3d = rng.uniform(-1, 1, (68, 3))

    preprocess_dir(str(tmp_path), landmarks_3d=lm3d)

    assert (tmp_path / "raw" / "1.png").exists()
    assert (tmp_path / "mask" / "1.png").exists()
    assert (tmp_path / "segRes" / "1.png").exists()
    assert (tmp_path / "segRelRes" / "1.png").exists()
    d = np.load(str(tmp_path / "pose_1.npy"), allow_pickle=True).item()
    assert d["pose"].shape == (4, 4)
    assert d["kp"].shape == (68, 2)
    # the seg image must be masked (corners zeroed)
    seg = np.asarray(imageio.imread(str(tmp_path / "segRes" / "1.png")))
    assert seg[0, 0].sum() == 0
    assert seg[260, 256].sum() > 0
