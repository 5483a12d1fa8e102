"""Ray-marching sample placement: stratified + inverse-CDF importance sampling.

Behavioral parity with the reference stratified sampler
(models/render_class.py:291-313) and `sample_pdf`
(models/model.py:314-357), re-expressed with explicit JAX PRNG keys instead
of global torch RNG — the determinism the reference only exposes through its
`pytest=` seeding hooks is the default here.

TPU notes: all shapes are static (N_samples / N_importance are compile-time
constants per the shipped config, configs/exp_mofanerf.txt:16-17), so the
whole two-pass hierarchy stays inside one jit. `sample_pdf` uses a vectorized
`searchsorted` over the CDF — O(N log N) on the VPU, no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: jax.Array | None,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 0.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Place `n_samples` depths per ray in [near, far].

    near/far: [..., 1] or broadcastable. Returns [..., n_samples].
    With perturb > 0, jitter each sample uniformly within its stratum
    (models/render_class.py:299-313).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals

    if perturb > 0.0:
        assert key is not None, "stratified perturbation requires a PRNG key"
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    key: jax.Array | None,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of `n_samples` new depths from coarse weights.

    bins: [N_rays, M] bin edges (z-midpoints), weights: [N_rays, M-1].
    Matches models/model.py:314-357: +1e-5 weight floor, right-continuous
    searchsorted, degenerate-interval guard at 1e-5.

    Gradients are stopped — the reference detaches z_samples
    (models/render_class.py:326); resampling positions are treated as
    constants w.r.t. the loss.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, M]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert key is not None, "stochastic sample_pdf requires a PRNG key"
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # searchsorted along last axis, batched.
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return jax.lax.stop_gradient(samples)
