"""Fused Pallas field kernel parity tests (interpreter mode on CPU; the
same kernel is validated compiled on the real chip by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mofanerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    fold_conditioning,
    apply_field_folded,
)
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.pallas_field import pack_fused_params, fused_field_apply, _plan_len


@pytest.mark.parametrize("depth", [8, 10])
def test_fused_kernel_matches_xla(depth):
    cfg = FieldConfig(depth=depth, width=256, compute_dtype=jnp.bfloat16)
    params = init_field_params(jax.random.PRNGKey(0), cfg)
    # contracting weights: bound bf16 accumulation-order noise (see
    # tests/test_field.py)
    params = jax.tree_util.tree_map(lambda w: w * 0.4, params)
    cond = fold_conditioning(
        params, jnp.ones(50) * 0.1, jnp.ones(30) * 0.1, jnp.ones(256) * 0.1
    )
    fused = pack_fused_params(params, cond, cfg)
    assert fused.w_stack.shape == (_plan_len(cfg), 256, 256)

    R, S = 16, 128
    pe = fourier_embed(
        jax.random.normal(jax.random.PRNGKey(1), (R * S, 3)) * 0.5, cfg.multires
    )
    dirf = jax.random.normal(jax.random.PRNGKey(2), (R, 128)) * 0.1

    rgb_k, sig_k = fused_field_apply(fused, pe, dirf, cfg, S, block_rays=8, interpret=True)
    rgb_r, sig_r = apply_field_folded(params, cond, pe, dirf, cfg, samples_per_ray=S)

    np.testing.assert_allclose(
        np.asarray(rgb_r, np.float32), np.asarray(rgb_k), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(sig_r, np.float32), np.asarray(sig_k)[:, 0:1], atol=5e-3
    )


def test_fused_kernel_multi_block():
    """Grid > 1: block boundaries must not leak state."""
    cfg = FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda w: w * 0.4, init_field_params(jax.random.PRNGKey(3), cfg)
    )
    cond = fold_conditioning(params, jnp.zeros(50), jnp.zeros(30), jnp.zeros(256))
    fused = pack_fused_params(params, cond, cfg)
    R, S = 32, 64  # 4 blocks of 8 rays
    pe = fourier_embed(
        jax.random.normal(jax.random.PRNGKey(4), (R * S, 3)) * 0.5, cfg.multires
    )
    dirf = jax.random.normal(jax.random.PRNGKey(5), (R, 128)) * 0.1
    rgb_k, _ = fused_field_apply(fused, pe, dirf, cfg, S, block_rays=8, interpret=True)
    rgb_r, _ = apply_field_folded(params, cond, pe, dirf, cfg, samples_per_ray=S)
    np.testing.assert_allclose(np.asarray(rgb_r, np.float32), np.asarray(rgb_k), atol=5e-3)
