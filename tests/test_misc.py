import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.ops.uv_sample import bilinear_sample
from mofanerf_tpu.utils.profiling import StepTimer
from mofanerf_tpu.utils.logger import TrainLogger


def test_bilinear_sample_exact_at_pixels():
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)), jnp.float32)
    coords = jnp.asarray([[2.0, 3.0], [0.0, 0.0], [7.0, 7.0]])
    out = bilinear_sample(uv, coords)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(uv[2, 3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(uv[7, 7]), atol=1e-6)


def test_bilinear_sample_interpolates():
    uv = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0)
    mid = bilinear_sample(uv, jnp.asarray([[1.5, 1.0]]))
    np.testing.assert_allclose(float(mid[0, 0]), 0.5, atol=1e-6)


def test_bilinear_sample_grads_to_coords():
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (8, 8, 3)), jnp.float32)

    def f(c):
        return jnp.sum(bilinear_sample(uv, c))

    g = jax.grad(f)(jnp.asarray([[3.3, 4.7]]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_nan_guard_skips_bad_step():
    from mofanerf_tpu.models.field import FieldConfig
    from mofanerf_tpu.render.renderer import MoFaNeRF, RenderConfig
    from mofanerf_tpu.train.state import Batch, create_train_state, make_optimizer, train_step

    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=16),
        fine=FieldConfig(depth=8, width=16),
        render=RenderConfig(n_coarse=4, n_importance=4),
        uv_size=128,
    )
    state = create_train_state(jax.random.PRNGKey(0), spec)
    tx = make_optimizer()
    rd = np.random.default_rng(0).standard_normal((8, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    bad = Batch(
        rays_o=jnp.zeros((8, 3)),
        rays_d=jnp.asarray(rd),
        target_rgb=jnp.full((8, 3), jnp.nan),  # poisoned batch
        shape_code=jnp.zeros(50),
        exp_type=jnp.asarray(0),
        uv_map=jnp.full((128, 128, 3), 0.5),
    )
    new_state, metrics = train_step(state, bad, jax.random.PRNGKey(1), spec, tx)
    assert not bool(metrics["step_ok"])
    # params unchanged after the poisoned step
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(new_state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances


def test_render_path_shapes():
    from mofanerf_tpu.models.field import FieldConfig
    from mofanerf_tpu.render.renderer import (
        MoFaNeRF, RenderConfig, init_model_params, prepare_conditioning,
        render_path, exp_code_for,
    )
    from mofanerf_tpu.ops.rays import pose_spherical

    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=16),
        fine=FieldConfig(depth=8, width=16),
        render=RenderConfig(n_coarse=4, n_importance=4, packet_size=64),
        uv_size=128,
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(
        params, spec, jnp.zeros(50), exp_code_for(params, 0), jnp.zeros(256)
    )
    poses = np.stack([pose_spherical(a, 0.0, 16.0) for a in (-30, 0, 30)])
    rgbs, disps = render_path(params, spec, cond, poses, (16, 16, 20.0), render_factor=2)
    assert rgbs.shape == (3, 8, 8, 3)
    assert disps.shape == (3, 8, 8)


def test_step_timer():
    t = StepTimer(warmup=1)
    t.tick(); t.tick(); t.tick()
    assert t.steps_per_sec > 0


def test_logger_resume(tmp_path):
    p = str(tmp_path / "log.txt")
    lg = TrainLogger(p)
    lg.write(5, Loss=0.1)
    lg.write(12, Loss=0.05)
    lg2 = TrainLogger(p)
    assert lg2.last_iteration() == 12
    assert "# resumed" in open(p).read()


def test_ssim_properties():
    from mofanerf_tpu.utils.metrics import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert abs(ssim(a, a) - 1.0) < 1e-9  # identical -> 1
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    c = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    s_b, s_c = ssim(a, b), ssim(a, c)
    assert 0 < s_c < s_b < 1  # more noise -> lower ssim
    assert ssim(a, 1 - a) < 0.3


def test_visualizer_html_gallery(tmp_path):
    """index.html groups by epoch, newest epoch first, one cell per image
    (parity with the reference gallery, refine_mod/util/visualizer.py:60-96)."""
    import numpy as np
    from mofanerf_tpu.utils.visualizer import Visualizer

    v = Visualizer(str(tmp_path), name="exp1")
    img = np.zeros((4, 4, 3), np.float32)
    v.save_images(1, {"real": img, "fake": img})
    v.save_images(2, {"real": img})
    html = (tmp_path / "web" / "index.html").read_text()
    assert "epoch [2]" in html and "epoch [1]" in html
    assert html.index("epoch [2]") < html.index("epoch [1]"), "newest first"
    assert html.count("<img") == 3
    assert 'src="images/epoch001_fake.png"' in html
    assert "refresh" in html
    v.print_errors(1, 10, {"loss_G": 0.5}, 0.1)
    assert "loss_G" in (tmp_path / "loss_log.txt").read_text()
