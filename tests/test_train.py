import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig
from mofanerf_tpu.train.state import (
    Batch,
    create_train_state,
    make_optimizer,
    train_step,
    lr_at,
)

SPEC = MoFaNeRF(
    coarse=FieldConfig(depth=8, width=32),
    fine=FieldConfig(depth=8, width=32),
    render=RenderConfig(n_coarse=8, n_importance=8),
    uv_size=128,
)


def _batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return Batch(
        rays_o=jnp.asarray(rng.standard_normal((n, 3)) * 0.1, jnp.float32),
        rays_d=jnp.asarray(rd),
        target_rgb=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        shape_code=jnp.asarray(rng.standard_normal(50) * 0.1, jnp.float32),
        exp_type=jnp.asarray(3, jnp.int32),
        uv_map=jnp.asarray(rng.uniform(0, 1, (128, 128, 3)), jnp.float32),
    )


def test_lr_schedule():
    np.testing.assert_allclose(float(lr_at(0, 5e-5, 250)), 5e-5, rtol=1e-6)
    # at step = decay*1500 the lr has decayed by 10x
    np.testing.assert_allclose(float(lr_at(250 * 1500, 5e-5, 250)), 5e-6, rtol=1e-5)


def test_train_step_decreases_loss():
    state = create_train_state(jax.random.PRNGKey(0), SPEC, lrate=1e-3)
    tx = make_optimizer(lrate=1e-3)
    batch = _batch()
    step = jax.jit(lambda s, b, k: train_step(s, b, k, SPEC, tx))
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert int(state.step) == 30
    assert np.isfinite(losses).all()
    # Optimizing a fixed batch must make real progress. (A tiny random-init
    # field can also density-collapse under aggressive lr — judged on the
    # best loss reached, not the final value.)
    assert min(losses[1:]) < losses[0] * 0.9, losses


def test_train_step_updates_all_components():
    state = create_train_state(jax.random.PRNGKey(1), SPEC)
    tx = make_optimizer()
    new_state, _ = train_step(state, _batch(), jax.random.PRNGKey(0), SPEC, tx)
    for name in ["coarse", "fine", "ism", "tex_encoder", "exp_codes"]:
        before = jax.tree_util.tree_leaves(state.params[name])
        after = jax.tree_util.tree_leaves(new_state.params[name])
        changed = any(
            not np.array_equal(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after)
        )
        assert changed, f"{name} params unchanged after a step"


def test_checkpoint_roundtrip(tmp_path):
    from mofanerf_tpu.train.checkpoint import (
        save_checkpoint,
        restore_checkpoint,
        latest_step,
    )

    state = create_train_state(jax.random.PRNGKey(2), SPEC)
    save_checkpoint(str(tmp_path), state, 7)
    save_checkpoint(str(tmp_path), state, 12)
    assert latest_step(str(tmp_path)) == 12
    restored = restore_checkpoint(str(tmp_path), state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
