"""Parity of the fused Pallas serving kernel with the XLA bounded renderer
(interpret mode on CPU; the compiled kernel runs the same program)."""
import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused
from mofanerf_tpu.render.serve import render_rays_bounded

NEAR, FAR = 8.0, 26.0
AABB = ((-2.0,) * 3, (2.0,) * 3)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = jnp.tile(jnp.asarray([[0.0, 0, 16.0]]), (n, 1))
    # mix of hitting and missing directions, unnormalized (dists scaling)
    to = rng.standard_normal((n, 3)) * np.array([1.5, 1.5, 0.2]) - [0, 0, 16]
    rd = to / np.linalg.norm(to, axis=-1, keepdims=True) * rng.uniform(0.7, 1.4, (n, 1))
    rd[: n // 8] = [0.0, 0, 1.0]  # guaranteed misses
    return ro, jnp.asarray(rd.astype(np.float32))


def test_fused_matches_xla_bounded():
    cfg = StudentConfig(depth=4, width=128, multires=8, compute_dtype=jnp.float32)
    params, _ = init_point_field(jax.random.PRNGKey(0), cfg)
    # visible structure: positive density bias
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    ro, rd = _rays(256)

    ref = render_rays_bounded(params, cfg, None, ro, rd, NEAR, FAR, 16, *AABB)
    got = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 16, *AABB,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["acc"]), np.asarray(ref["acc"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth"]), np.asarray(ref["depth"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["disp"]), np.asarray(ref["disp"]),
                               rtol=1e-3, atol=1e-3)
    acc = np.asarray(got["acc"])
    assert (acc[:32] == 0).all(), "miss rays must be background"
    assert (acc > 0.5).any(), "scene unexpectedly empty"


def test_fused_white_background_and_bf16():
    cfg = StudentConfig(depth=4, width=128, multires=8,
                        compute_dtype=jnp.bfloat16)
    params, _ = init_point_field(jax.random.PRNGKey(1), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    ro, rd = _rays(256, seed=1)
    ref = render_rays_bounded(params, cfg, None, ro, rd, NEAR, FAR, 8, *AABB,
                              white_bkgd=True)
    got = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 8, *AABB,
                                    white_bkgd=True, interpret=True)
    # bf16 MLP: tolerances match the dtype, not the algorithm
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got["acc"]), np.asarray(ref["acc"]),
                               rtol=2e-2, atol=2e-2)
    # miss rays are exactly white in both
    assert (np.asarray(got["rgb"])[:32] == 1.0).all()


def test_fused_multi_block():
    cfg = StudentConfig(depth=3, width=128, multires=6, compute_dtype=jnp.float32)
    params, _ = init_point_field(jax.random.PRNGKey(2), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    ro, rd = _rays(512, seed=2)
    ref = render_rays_bounded(params, cfg, None, ro, rd, NEAR, FAR, 8, *AABB)
    got = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 8, *AABB,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-4)


def test_frame_serve_fused_matches_unfused():
    from mofanerf_tpu.render.serve import render_frame_serve
    from mofanerf_tpu.ops.rays import pose_spherical

    cfg = StudentConfig(depth=3, width=128, multires=6, compute_dtype=jnp.float32)
    params, cond = init_point_field(jax.random.PRNGKey(3), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    K = jnp.asarray([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]])
    c2w = jnp.asarray(pose_spherical(10.0, -5.0, 16.0))[:3]
    kw = dict(near=NEAR, far=FAR, n_samples=8, aabb_min=AABB[0],
              aabb_max=AABB[1], packet_size=256, hit_fraction=1.0)
    a = render_frame_serve(params, cfg, cond, 16, 16, K, c2w, fused=False, **kw)
    b = render_frame_serve(params, cfg, cond, 16, 16, K, c2w, fused=True, **kw)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b["acc"]), np.asarray(a["acc"]),
                               rtol=1e-4, atol=1e-4)


def test_fused_block_variants_agree():
    """block_r is a pure layout knob — outputs must be identical across
    block sizes."""
    cfg = StudentConfig(depth=3, width=128, multires=6,
                        compute_dtype=jnp.float32)
    params, _ = init_point_field(jax.random.PRNGKey(5), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    ro, rd = _rays(512, seed=5)

    base = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 8, *AABB,
                                     interpret=True, block_r=256)
    for block_r in (512, 128):
        got = render_rays_bounded_fused(params, cfg, ro, rd, NEAR, FAR, 8,
                                        *AABB, interpret=True,
                                        block_r=block_r)
        np.testing.assert_allclose(np.asarray(got["rgb"]),
                                   np.asarray(base["rgb"]),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"{block_r=}")
        np.testing.assert_allclose(np.asarray(got["acc"]),
                                   np.asarray(base["acc"]),
                                   rtol=1e-5, atol=1e-5)


def test_frame_serve_fused_handles_non_block_ray_counts():
    """A frame whose ray count is not a multiple of 256 must round its
    packet up to whole fused blocks (padding covers the rest) instead of
    tripping the kernel's block assert."""
    from mofanerf_tpu.render.serve import render_frame_serve
    from mofanerf_tpu.ops.rays import pose_spherical

    cfg = StudentConfig(depth=2, width=128, multires=4,
                        compute_dtype=jnp.float32)
    params, cond = init_point_field(jax.random.PRNGKey(6), cfg)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    K = jnp.asarray([[30.0, 0, 9.0], [0, 30.0, 9.0], [0, 0, 1.0]])
    c2w = jnp.asarray(pose_spherical(5.0, -5.0, 16.0))[:3]
    kw = dict(near=NEAR, far=FAR, n_samples=4, aabb_min=AABB[0],
              aabb_max=AABB[1], packet_size=8192, hit_fraction=1.0)
    # 18x18 = 324 rays: not a multiple of 256, below packet_size
    a = render_frame_serve(params, cfg, cond, 18, 18, K, c2w, fused=False, **kw)
    b = render_frame_serve(params, cfg, cond, 18, 18, K, c2w, fused=True, **kw)
    assert b["rgb"].shape == (18, 18, 3)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               rtol=1e-4, atol=1e-4)
