"""Identity-specific modulation (ISM / "StyleModule").

Parity with reference models/model.py:174-199: a 4x256 ReLU MLP from the
50-dim shape code to (scale, bias), each `exp_dim`-dim, applied to the
expression latent as `exp' = scale * exp + bias`
(applied at models/render_class.py:75-81).

Runs once per frame (shape code is per-identity), so it costs nothing in the
hot loop — its output feeds `fold_conditioning`.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_ism_params(
    key: jax.Array, in_dim: int = 50, width: int = 256, depth: int = 4, out_dim: int = 30
) -> Params:
    gain = np.sqrt(2.0)
    ks = jax.random.split(key, 2 * depth + 4)
    layers = []
    d_in = in_dim
    for i in range(depth):
        a = gain * np.sqrt(6.0 / (d_in + width))
        w = jax.random.uniform(ks[2 * i], (d_in, width), minval=-a, maxval=a)
        b = jax.random.uniform(
            ks[2 * i + 1], (width,), minval=-1 / np.sqrt(d_in), maxval=1 / np.sqrt(d_in)
        )
        layers.append({"w": w, "b": b})
        d_in = width
    a = gain * np.sqrt(6.0 / (width + out_dim))
    bb = 1 / np.sqrt(width)
    return {
        "layers": layers,
        "scale": {
            "w": jax.random.uniform(ks[-4], (width, out_dim), minval=-a, maxval=a),
            "b": jax.random.uniform(ks[-3], (out_dim,), minval=-bb, maxval=bb),
        },
        "bias": {
            "w": jax.random.uniform(ks[-2], (width, out_dim), minval=-a, maxval=a),
            "b": jax.random.uniform(ks[-1], (out_dim,), minval=-bb, maxval=bb),
        },
    }


def apply_ism(params: Params, shape_code: jnp.ndarray):
    """shape_code [in_dim] -> (scale [out_dim], bias [out_dim])."""
    h = shape_code
    for layer in params["layers"]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    scale = h @ params["scale"]["w"] + params["scale"]["b"]
    bias = h @ params["bias"]["w"] + params["bias"]["b"]
    return scale, bias


def modulate_expression(params: Params, shape_code: jnp.ndarray, exp_code: jnp.ndarray):
    """exp' = scale * exp + bias (models/render_class.py:79-81)."""
    scale, bias = apply_ism(params, shape_code)
    return scale * exp_code + bias
