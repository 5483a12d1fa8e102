import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.ops.sampling import stratified_z_vals, sample_pdf


def test_stratified_det_linspace():
    near = jnp.full((5, 1), 8.0)
    far = jnp.full((5, 1), 26.0)
    z = stratified_z_vals(None, near, far, 64, perturb=0.0)
    assert z.shape == (5, 64)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(8, 26, 64), rtol=1e-6)


def test_stratified_perturb_within_strata():
    key = jax.random.PRNGKey(0)
    near = jnp.full((100, 1), 0.0)
    far = jnp.full((100, 1), 1.0)
    z = stratified_z_vals(key, near, far, 16, perturb=1.0)
    zd = np.asarray(z)
    base = np.linspace(0, 1, 16)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (zd >= lower - 1e-6).all() and (zd <= upper + 1e-6).all()
    # monotonic along each ray
    assert (np.diff(zd, axis=-1) >= 0).all()


def test_stratified_lindisp():
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)
    z = stratified_z_vals(None, near, far, 3, lindisp=True)
    want = 1.0 / (1.0 / 2.0 * (1 - np.array([0, 0.5, 1])) + 1.0 / 6.0 * np.array([0, 0.5, 1]))
    np.testing.assert_allclose(np.asarray(z[0]), want, rtol=1e-6)


def oracle_sample_pdf_det(bins, weights, n):
    """NumPy oracle: inverse-CDF with deterministic uniform u."""
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, n), cdf.shape[:-1] + (n,))
    out = np.empty_like(u)
    for r in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cb, ca = cdf[r][below], cdf[r][above]
        bb = bins[r][np.minimum(below, bins.shape[-1] - 1)]
        ba = bins[r][np.minimum(above, bins.shape[-1] - 1)]
        denom = np.where(ca - cb < 1e-5, 1.0, ca - cb)
        t = (u[r] - cb) / denom
        out[r] = bb + t * (ba - bb)
    return out


def test_sample_pdf_det_matches_oracle():
    rng = np.random.default_rng(3)
    bins = np.sort(rng.uniform(0, 10, (4, 63)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, (4, 62)).astype(np.float32)
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), 64, det=True))
    want = oracle_sample_pdf_det(bins, weights, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sample_pdf_concentrates_mass():
    """A weight spike should attract most fine samples."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 63), (1, 63))
    weights = jnp.zeros((1, 62)).at[0, 30].set(100.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, weights, 64))
    target = (30 / 62 + 31 / 62) / 2  # spike bin center in bin coords
    assert np.abs(np.median(s) - target) < 0.05


def test_sample_pdf_stochastic_in_range():
    key = jax.random.PRNGKey(7)
    bins = jnp.broadcast_to(jnp.linspace(2.0, 5.0, 63), (8, 63))
    weights = jax.random.uniform(key, (8, 62))
    s = np.asarray(sample_pdf(key, bins, weights, 64))
    assert (s >= 2.0 - 1e-5).all() and (s <= 5.0 + 1e-5).all()


def test_sample_pdf_stops_gradient():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 7), (1, 7))

    def f(w):
        return jnp.sum(sample_pdf(None, bins, w, 4, det=True))

    g = jax.grad(f)(jnp.ones((1, 6)))
    np.testing.assert_allclose(np.asarray(g), 0.0)
