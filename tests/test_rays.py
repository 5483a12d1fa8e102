import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.ops.rays import get_rays, ndc_rays, pose_spherical


def _K(f=1200.0, cx=256.0, cy=256.0):
    return jnp.asarray([[f, 0, cx], [0, f, cy], [0, 0, 1]], jnp.float32)


def test_get_rays_identity_cam():
    H = W = 8
    K = _K(f=100.0, cx=4.0, cy=4.0)
    c2w = jnp.eye(4)[:3]
    ro, rd = get_rays(H, W, K, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(ro), 0.0)
    # principal-point pixel looks straight down -z
    np.testing.assert_allclose(np.asarray(rd[4, 4]), [0, 0, -1], atol=1e-6)
    # pixel right of center: +x component; pixel below center (larger j): -y
    assert rd[4, 5, 0] > 0
    assert rd[5, 4, 1] < 0


def test_get_rays_oracle_loop():
    """Per-pixel loop oracle of the pinhole model."""
    H, W = 3, 4
    f, cx, cy = 50.0, 1.5, 1.0
    K = _K(f, cx, cy)
    rng = np.random.default_rng(2)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    t = rng.standard_normal(3)
    c2w = np.concatenate([q, t[:, None]], axis=1).astype(np.float32)
    ro, rd = get_rays(H, W, K, jnp.asarray(c2w))
    for jj in range(H):
        for ii in range(W):
            d_cam = np.array([(ii - cx) / f, -(jj - cy) / f, -1.0])
            d_world = q @ d_cam
            np.testing.assert_allclose(np.asarray(rd[jj, ii]), d_world, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ro[jj, ii]), t, atol=1e-5)


def test_rays_differentiable_in_pose():
    H = W = 4
    K = _K(f=10.0, cx=2.0, cy=2.0)

    def loss(c2w):
        ro, rd = get_rays(H, W, K, c2w)
        return jnp.sum(rd**2) + jnp.sum(ro)

    g = jax.grad(loss)(jnp.eye(4)[:3])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_ndc_rays_shapes():
    ro = jnp.ones((10, 3)) * jnp.asarray([0.0, 0.0, -2.0])
    rd = jnp.tile(jnp.asarray([0.1, 0.0, -1.0]), (10, 1))
    o, d = ndc_rays(8, 8, 10.0, 1.0, ro, rd)
    assert o.shape == (10, 3) and d.shape == (10, 3)
    assert np.isfinite(np.asarray(o)).all()


def test_pose_spherical_radius():
    c2w = pose_spherical(30.0, -20.0, 16.0)
    assert c2w.shape == (4, 4)
    # camera center is at distance `radius` from origin
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 16.0, rtol=1e-5)
    # rotation block is orthonormal
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
