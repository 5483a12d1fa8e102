"""Fourier positional encoding.

Behavioral parity with the reference `Embedder`/`get_embedder`
(reference: models/model.py:15-63): log-spaced frequency bands
2**linspace(0, multires-1, multires), sin/cos pairs, input included.

Output channel order matches the reference exactly:
  [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]
so converted reference checkpoints produce identical activations.

TPU notes: this is a pure jnp function with static shapes; XLA fuses it into
the consuming matmul. The frequency bands are compile-time constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def embed_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    """Output dimension of `fourier_embed`."""
    d = input_dims if include_input else 0
    return d + input_dims * num_freqs * 2


def fourier_embed(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Encode `x[..., D]` -> `[..., embed_dim(D, num_freqs)]`.

    num_freqs = `multires` in the reference config (10 for xyz -> 63 dims,
    4 for view dirs -> 27 dims; tools/config_parser.py:53-56).
    """
    if num_freqs == 0:
        # honor include_input so the output always matches embed_dim()
        return x if include_input else x[..., :0]
    # 2 ** linspace(0, num_freqs - 1, num_freqs) — log-sampled bands.
    freqs = np.exp2(np.linspace(0.0, num_freqs - 1, num_freqs)).astype(np.float32)
    # [..., D, 1] * [F] -> [..., D, F]
    xb = x[..., None] * jnp.asarray(freqs)
    # Interleave (sin, cos) per frequency, flattened in (F, sin/cos, D) order
    # to match the reference's per-frequency concat of sin then cos.
    sin = jnp.sin(xb)  # [..., D, F]
    cos = jnp.cos(xb)
    # Reference order: for each freq, sin(x*f) [D] then cos(x*f) [D].
    sin_t = jnp.moveaxis(sin, -1, -2)  # [..., F, D]
    cos_t = jnp.moveaxis(cos, -1, -2)  # [..., F, D]
    both = jnp.concatenate([sin_t[..., None, :], cos_t[..., None, :]], axis=-2)  # [..., F, 2, D]
    flat = both.reshape(*x.shape[:-1], -1)  # [..., F*2*D]
    if include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat
