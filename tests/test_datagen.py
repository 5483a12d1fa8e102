import json
import os

import numpy as np

from mofanerf_tpu.datagen.mesh import (
    load_obj,
    save_obj,
    apply_rt_scale,
    clip_faces_by_distance,
)
from mofanerf_tpu.datagen.rasterize import rasterize_mesh
from mofanerf_tpu.datagen.multiview import (
    camera_grid,
    render_identity,
    camera_angle_x,
)
from mofanerf_tpu.ops.rays import pose_spherical


def _cube(size=1.0):
    v = np.array([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ], np.float64) * size
    f = np.array([
        [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
        [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
        [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
    ], np.int32)
    return v, f


def test_obj_roundtrip(tmp_path):
    v, f = _cube()
    p = str(tmp_path / "cube.obj")
    save_obj(p, v, f)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_obj_quads_triangulated(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1/1 2/2 3/3 4/4\n")
    v, f = load_obj(p)
    assert f.shape == (2, 3)  # quad -> two triangles


def test_apply_rt_scale():
    v, _ = _cube()
    Rt = np.eye(4)
    Rt[:3, 3] = [1, 2, 3]
    out = apply_rt_scale(v, 2.0, Rt)
    np.testing.assert_allclose(out, v * 2 + np.array([1, 2, 3]))


def test_clip_faces():
    v, f = _cube(1.0)
    v2 = v.copy()
    v2[0] = [100, 0, 0]  # one far vertex
    kept = clip_faces_by_distance(v2, f, max_distance=10.0)
    assert len(kept) < len(f)
    assert not (kept == 0).any(axis=1).any()  # faces touching vert 0 dropped


def test_rasterize_cube_visible():
    v, f = _cube(1.5)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    c2w = pose_spherical(30.0, -20.0, 8.0)
    rgb, depth, mask = rasterize_mesh(v, f, K, c2w, H=64, W=64, tile=48)
    assert rgb.shape == (64, 64, 3)
    assert mask.any(), "cube not visible"
    # center pixel hits the cube; corner doesn't
    assert mask[32, 32]
    assert not mask[0, 0]
    # depth at hits is near the camera distance (8) minus cube extent
    d = depth[mask]
    assert 4.0 < d.min() < 8.0 and d.max() < 12.0
    assert rgb[mask].max() > 0.1


def test_rasterize_depth_ordering():
    """A near triangle must occlude a far one."""
    v = np.array([
        # far big triangle (red-ish shading irrelevant; colors from normals)
        [-2, -2, -2], [2, -2, -2], [0, 2.5, -2],
        # near small triangle
        [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0, 0.6, 0.0],
    ], np.float64)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[2, 3] = 5.0  # camera at z=5 looking down -z
    rgb, depth, mask = rasterize_mesh(v, f, K, c2w, H=64, W=64, tile=64)
    assert mask[32, 32]
    np.testing.assert_allclose(depth[32, 32], 5.0, atol=0.1)  # near tri wins


def test_camera_grid_counts():
    poses = camera_grid()
    assert len(poses) == 120
    for p in poses[:5]:
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 16.0, rtol=1e-5)


def test_render_identity_writes_dataset(tmp_path):
    v, f = _cube(1.2)
    render_identity(7, {0: (v, f), 3: (v, f)}, str(tmp_path), n_holdout=20, res=32)
    meta = json.load(open(tmp_path / "transforms_train_7.json"))
    assert abs(meta["camera_angle_x"] - camera_angle_x()) < 1e-9
    n_train = len(meta["frames"])
    n_val = len(json.load(open(tmp_path / "transforms_val_7.json"))["frames"])
    n_test = len(json.load(open(tmp_path / "transforms_test_7.json"))["frames"])
    assert n_train + n_val + n_test == 240  # 2 expressions x 120 views
    assert n_val + n_test == 40
    assert {fr["expression"] for fr in meta["frames"]} == {0, 3}
    # images exist and are RGBA
    import imageio.v2 as imageio

    img = imageio.imread(tmp_path / (meta["frames"][0]["file_path"] + ".png"))
    assert img.shape == (32, 32, 4)
    # resumable: second call skips
    render_identity(7, {0: (v, f)}, str(tmp_path), res=32)


def test_loadable_by_facescape_loader(tmp_path):
    """The produced dataset must round-trip through the training loader."""
    from mofanerf_tpu.data.facescape import load_facescape_data

    v, f = _cube(1.2)
    render_identity(0, {0: (v, f)}, str(tmp_path), res=32)
    shape_codes = np.zeros((300, 50), np.float32)
    ds = load_facescape_data(str(tmp_path), [0], shape_codes, testskip=1)
    assert len(ds.image_paths) == 120
    assert ds.hwf[0] == 32


# ---------------------------------------------------------------------------
# Procedural face family (datagen/synthetic_faces.py)
# ---------------------------------------------------------------------------

def test_face_mesh_shapes_and_finiteness():
    from mofanerf_tpu.datagen.synthetic_faces import face_mesh, sample_identity_params

    p = sample_identity_params(1, seed=3)[0]
    v, f, alb = face_mesh(p, 0, n_lat=16, n_lon=24)
    assert v.shape == (16 * 24 + 2, 3) and np.isfinite(v).all()
    assert f.shape == ((16 - 1) * 24 * 2 + 2 * 24, 3)
    assert alb.shape == (f.shape[0], 3)
    assert (alb >= 0).all() and (alb <= 1).all()
    # head is ~4 world units across, centered near origin
    assert 1.2 < np.abs(v).max() < 4.0


def test_face_identity_and_expression_control():
    """Different identity params and different expressions must change the
    rendered image (the conditioning signal the morphable study trains on)."""
    from mofanerf_tpu.datagen.rasterize import rasterize_mesh
    from mofanerf_tpu.datagen.synthetic_faces import face_mesh, sample_identity_params
    from mofanerf_tpu.ops.rays import pose_spherical

    res = 64
    K = np.array([[1200.0 * res / 512, 0, res / 2],
                  [0, 1200.0 * res / 512, res / 2], [0, 0, 1]])
    c2w = pose_spherical(0.0, 0.0, 16.0)
    ps = sample_identity_params(2, seed=0)

    def render(p, exp):
        v, f, alb = face_mesh(p, exp, n_lat=24, n_lon=32)
        rgb, _, _ = rasterize_mesh(v, f, K, c2w, res, res, face_albedo=alb)
        return rgb

    base = render(ps[0], 0)
    other_id = render(ps[1], 0)
    jaw = render(ps[0], 2)
    assert np.abs(base - other_id).mean() > 0.01, "identities indistinct"
    assert np.abs(base - jaw).mean() > 0.003, "expressions indistinct"
    # smooth parameter interpolation -> intermediate geometry
    mid = render((ps[0] + ps[1]) / 2, 0)
    d_direct = np.abs(base - other_id).mean()
    assert np.abs(base - mid).mean() < d_direct, "interpolation not intermediate"


def test_make_face_dataset_layout(tmp_path):
    """The generated family loads through the canonical FaceScape loader
    with codes == identity params and usable landmarks."""
    from mofanerf_tpu.data.facescape import load_facescape_data, load_shape_codes
    from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

    params = make_face_dataset(
        str(tmp_path), n_ids=2, exp_ids=(0, 2), res=32, seed=1,
        view_stride=12, n_holdout=4, n_lat=12, n_lon=16,
    )
    assert params.shape == (2, 10)
    codes = load_shape_codes(str(tmp_path / "factors_id.npy"))
    assert codes.shape[0] >= 300
    np.testing.assert_allclose(codes[:2, :10], params, atol=1e-6)
    assert np.abs(codes[:2, 10:]).max() == 0

    ds = load_facescape_data(str(tmp_path), [0, 1], codes,
                             uvdir=str(tmp_path / "uv"), testskip=1)
    # 2 ids x 2 exps x 10 views
    assert len(ds.image_paths) == 2 * 2 * 10
    assert set(np.unique(ds.exp_types)) == {0, 2}
    assert all(os.path.exists(p) for p in ds.uv_paths.values())

    lms = np.load(tmp_path / "landmarks.npy")
    assert lms.shape == (300, 20, 68, 3)
    # landmarks live on the head (world units after /50)
    r = np.linalg.norm(lms[0, 0] / 50.0, axis=-1)
    assert (r > 1.0).all() and (r < 4.0).all()


def test_make_face_dataset_resume_guard(tmp_path):
    """Per-identity resume only accepts an IDENTICAL generation config —
    round 4's refine corpus carried stale identity-0 views after a config
    change precisely because resume was silent (VERDICT r4 weak #3)."""
    import pytest

    from mofanerf_tpu.datagen.synthetic_faces import make_face_dataset

    kw = dict(n_ids=1, exp_ids=(0,), res=32, seed=1, view_stride=40,
              n_holdout=1, n_lat=12, n_lon=16)
    make_face_dataset(str(tmp_path), **kw)
    make_face_dataset(str(tmp_path), **kw)  # same config: resume is a no-op
    with pytest.raises(RuntimeError, match="different config"):
        make_face_dataset(str(tmp_path), **{**kw, "seed": 2})


def test_make_face_dataset_explicit_params(tmp_path):
    """`id_params` overrides seeded sampling: the written family carries the
    given rows verbatim (used to add TRUE midpoint identities — the
    generator is linear in the params, so interpolated rows rasterize the
    genuine intermediate faces)."""
    from mofanerf_tpu.datagen.synthetic_faces import (
        make_face_dataset, sample_identity_params,
    )

    base = sample_identity_params(2, seed=1)
    mids = (base[0:1] + base[1:2]) / 2.0
    explicit = np.concatenate([base, mids])
    params = make_face_dataset(
        str(tmp_path), n_ids=999, exp_ids=(0,), res=32, seed=1,
        view_stride=40, n_holdout=1, n_lat=12, n_lon=16,
        id_params=explicit,
    )
    assert params.shape == (3, 10)
    np.testing.assert_allclose(params, explicit, atol=0)
    codes = np.load(tmp_path / "factors_id.npy")
    np.testing.assert_allclose(codes[2, :10], mids[0], atol=1e-6)
    assert os.path.exists(tmp_path / "2" )
    assert os.path.exists(tmp_path / "uv" / "2" / "1_neutral.jpg")


def test_expression_bank_20_distinct_and_legacy_exact():
    """All 20 FaceScape expression ids produce pairwise-distinct deformation
    fields, and ids 0/1/2/18 reproduce the legacy 3-axis triples EXACTLY
    (the round-3 faces8 datasets must stay renderable bit-identically)."""
    from mofanerf_tpu.datagen.synthetic_faces import (
        EXPRESSION_PARAMS, _feature_fields)

    assert sorted(EXPRESSION_PARAMS) == list(range(20))
    a = np.linspace(-1.2, 1.2, 41)
    b = np.linspace(-1.0, 1.0, 41)
    A, B = np.meshgrid(a, b)
    p = np.random.default_rng(0).normal(size=10)
    bumps = {e: _feature_fields(A, B, p, v)["bump"]
             for e, v in EXPRESSION_PARAMS.items()}
    for e1 in range(20):
        for e2 in range(e1 + 1, 20):
            d = np.abs(bumps[e1] - bumps[e2]).max()
            assert d > 1e-3, f"expressions {e1}/{e2} degenerate ({d})"
    legacy = {0: (0.0, 0.0, 0.0), 1: (0.15, 1.0, 0.35),
              2: (1.0, 0.0, 0.15), 18: (0.0, 0.1, 1.0)}
    for e, tri in legacy.items():
        d = np.abs(bumps[e] - _feature_fields(A, B, p, tri)["bump"]).max()
        assert d == 0.0, f"legacy expression {e} drifted ({d})"
