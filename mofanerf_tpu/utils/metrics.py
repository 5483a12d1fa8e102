"""Image metrics (reference: models/model.py:9-11)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x) -> np.ndarray:
    """Clip to [0,1] and quantize to uint8 (host-side)."""
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)
