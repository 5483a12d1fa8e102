import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.tex_encoder import TextureEncoder


def test_tex_encoder_shapes_and_jit():
    enc = TextureEncoder(tex_dim=256)
    key = jax.random.PRNGKey(0)
    uv = jnp.zeros((1, 512, 512, 3))
    params = enc.init(key, uv)
    out = jax.jit(enc.apply)(params, uv)
    assert out.shape == (1, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_tex_encoder_batched():
    enc = TextureEncoder(tex_dim=64)
    key = jax.random.PRNGKey(1)
    uv = jax.random.uniform(key, (3, 512, 512, 3))
    params = enc.init(key, uv[:1])
    out = enc.apply(params, uv)
    assert out.shape == (3, 64)
    # different inputs -> different codes
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_tex_encoder_grads():
    enc = TextureEncoder(tex_dim=32)
    key = jax.random.PRNGKey(2)
    uv = jax.random.uniform(key, (1, 512, 512, 3))
    params = enc.init(key, uv)

    def loss(p):
        return jnp.sum(enc.apply(p, uv) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))
