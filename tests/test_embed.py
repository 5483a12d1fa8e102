import numpy as np
import jax.numpy as jnp

from mofanerf_tpu.ops.embed import fourier_embed, embed_dim


def oracle_embed(x: np.ndarray, num_freqs: int, include_input=True) -> np.ndarray:
    """Independent NumPy oracle: include input, then per log-spaced frequency
    band sin(x*f) followed by cos(x*f)."""
    outs = [x] if include_input else []
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, axis=-1)


def test_embed_dims():
    assert embed_dim(3, 10) == 63  # xyz: 3 + 3*10*2
    assert embed_dim(3, 4) == 27   # viewdirs: 3 + 3*4*2


def test_embed_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 3)).astype(np.float32)
    got = np.asarray(fourier_embed(jnp.asarray(x), 10))
    want = oracle_embed(x, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_embed_views_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 4, 3)).astype(np.float32)
    got = np.asarray(fourier_embed(jnp.asarray(x), 4))
    want = oracle_embed(x, 4)
    assert got.shape == (5, 4, 27)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_embed_no_input():
    x = np.ones((2, 3), np.float32)
    got = fourier_embed(jnp.asarray(x), 2, include_input=False)
    assert got.shape == (2, 12)
