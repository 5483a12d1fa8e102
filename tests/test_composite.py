import numpy as np
import jax.numpy as jnp

from mofanerf_tpu.ops.composite import composite


def oracle_composite(raw_rgb, raw_sigma, z_vals, rays_d, white_bkgd=False):
    """Independent NumPy oracle of standard NeRF alpha compositing."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw_rgb))
    alpha = 1.0 - np.exp(-np.maximum(raw_sigma, 0) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
    )[..., :-1]
    w = alpha * trans
    rgb_map = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    if white_bkgd:
        rgb_map = rgb_map + (1 - acc[..., None])
    return rgb_map, acc, w, depth


def test_composite_matches_oracle():
    rng = np.random.default_rng(4)
    N, S = 6, 16
    raw_rgb = rng.standard_normal((N, S, 3)).astype(np.float32)
    raw_sigma = rng.standard_normal((N, S)).astype(np.float32) * 2
    z_vals = np.sort(rng.uniform(8, 26, (N, S)), -1).astype(np.float32)
    rays_d = rng.standard_normal((N, 3)).astype(np.float32)
    out = composite(
        jnp.asarray(raw_rgb), jnp.asarray(raw_sigma), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    rgb_o, acc_o, w_o, depth_o = oracle_composite(raw_rgb, raw_sigma, z_vals, rays_d)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), acc_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), w_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_o, rtol=1e-4, atol=1e-4)


def test_composite_opaque_first_sample():
    """A fully opaque first sample should dominate the pixel."""
    N, S = 1, 8
    raw_rgb = np.zeros((N, S, 3), np.float32)
    raw_rgb[0, 0] = 100.0  # sigmoid -> 1.0
    raw_sigma = np.zeros((N, S), np.float32)
    raw_sigma[0, 0] = 1e6
    z_vals = np.linspace(1, 2, S)[None].astype(np.float32)
    rays_d = np.asarray([[0, 0, 1.0]], np.float32)
    out = composite(
        jnp.asarray(raw_rgb), jnp.asarray(raw_sigma), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [1, 1, 1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth[0]), 1.0, atol=1e-3)


def test_composite_empty_space_white_bkgd():
    N, S = 2, 4
    raw_rgb = np.zeros((N, S, 3), np.float32)
    raw_sigma = np.full((N, S), -10.0, np.float32)  # relu -> 0 density
    z_vals = np.linspace(1, 2, S)[None].repeat(N, 0).astype(np.float32)
    rays_d = np.tile([[0, 0, 1.0]], (N, 1)).astype(np.float32)
    out = composite(
        jnp.asarray(raw_rgb), jnp.asarray(raw_sigma), jnp.asarray(z_vals),
        jnp.asarray(rays_d), white_bkgd=True,
    )
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-6)


def test_softplus_sigma_activation():
    """softplus option: same shapes, strictly positive density everywhere
    (no dead zone), reduces to ~relu for large positive sigma."""
    import jax
    import jax.numpy as jnp
    from mofanerf_tpu.ops.composite import composite

    n, s = 4, 8
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((n, s, 3)), jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(8, 26, (n, s)), jnp.float32), axis=-1)
    d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    sig_neg = jnp.full((n, s), -3.0)
    out_relu = composite(rgb, sig_neg, z, d, sigma_activation="relu")
    out_sp = composite(rgb, sig_neg, z, d, sigma_activation="softplus")
    # relu: fully transparent; softplus: slightly opaque (gradient alive)
    np.testing.assert_allclose(np.asarray(out_relu.acc), 0.0, atol=1e-6)
    assert (np.asarray(out_sp.acc) > 0).all()

    # gradient w.r.t. raw sigma is nonzero under softplus, zero under relu
    g = lambda act: jax.grad(
        lambda ss: composite(rgb, ss, z, d, sigma_activation=act).rgb.sum()
    )(sig_neg)
    assert float(jnp.abs(g("relu")).max()) == 0.0
    assert float(jnp.abs(g("softplus")).max()) > 0.0

    # big positive sigma: both saturate to the same opaque result
    sig_pos = jnp.full((n, s), 50.0)
    a = composite(rgb, sig_pos, z, d, sigma_activation="relu")
    b = composite(rgb, sig_pos, z, d, sigma_activation="softplus")
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=1e-5)
