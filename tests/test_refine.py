import numpy as np
import jax
import jax.numpy as jnp

from mofanerf_tpu.models.refine.generator import GlobalGenerator, InstanceNorm
from mofanerf_tpu.models.refine.discriminator import MultiscaleDiscriminator
from mofanerf_tpu.models.refine.losses import (
    VGG19Features,
    lsgan_loss,
    feature_matching_loss,
    vgg_perceptual_loss,
)
from mofanerf_tpu.train.refine import (
    RefineConfig,
    build_models,
    init_refine_state,
    make_refine_optimizers,
    refine_train_step,
    refine_inference,
)

# tiny config for CPU
CFG = RefineConfig(ngf=8, ndf=8, n_downsampling=2, n_blocks=2, num_D=2, n_layers_D=2,
                   use_vgg=False, niter=2, niter_decay=1)
SZ = 32


def test_instance_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 3 + 2
    y = InstanceNorm().apply({}, x)
    m = np.asarray(y.mean(axis=(1, 2)))
    s = np.asarray(y.std(axis=(1, 2)))
    np.testing.assert_allclose(m, 0, atol=1e-5)
    np.testing.assert_allclose(s, 1, atol=1e-3)


def test_generator_shapes():
    g = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    x = jnp.zeros((1, SZ, SZ, 3))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (1, SZ, SZ, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh range


def test_discriminator_multiscale_features():
    d = MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2)
    x = jnp.zeros((1, SZ, SZ, 6))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert len(out) == 2  # two scales
    # each scale: n_layers + 2 feature maps, last is patch logits with 1 ch
    for feats in out:
        assert len(feats) == 2 + 2
        assert feats[-1].shape[-1] == 1
    # second scale operates on a downsampled image
    assert out[1][-1].shape[1] < out[0][-1].shape[1]


def test_losses_behave():
    d = MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, SZ, SZ, 6))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    l_real = float(lsgan_loss(out, True))
    l_fake = float(lsgan_loss(out, False))
    assert np.isfinite([l_real, l_fake]).all()
    fm = float(feature_matching_loss(out, out))
    np.testing.assert_allclose(fm, 0.0, atol=1e-7)  # identical feats -> 0


def test_vgg_features_and_loss():
    vgg = VGG19Features()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.5
    params = vgg.init(jax.random.PRNGKey(0), x)
    feats = vgg.apply(params, x)
    assert len(feats) == 5
    # channel plan: relu{1..5}_1 channels
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    # spatial halving between slices
    assert feats[1].shape[1] == feats[0].shape[1] // 2
    loss = float(vgg_perceptual_loss(vgg, params, x, x))
    np.testing.assert_allclose(loss, 0.0, atol=1e-7)


def test_refine_train_step_adversarial_dynamics():
    state = init_refine_state(jax.random.PRNGKey(0), CFG, image_size=SZ)
    g_tx, d_tx = make_refine_optimizers(CFG)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, SZ, SZ, 3)) * 2 - 1
    b = jnp.clip(a + 0.1, -1, 1)
    step = jax.jit(lambda s, aa, bb: refine_train_step(s, aa, bb, CFG, g_tx, d_tx))
    metrics = None
    for i in range(3):
        state, metrics = step(state, a, b)
    assert int(state.step) == 3
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # both players' params changed
    fresh = init_refine_state(jax.random.PRNGKey(0), CFG, image_size=SZ)
    for name, old, new in [
        ("G", fresh.g_params, state.g_params),
        ("D", fresh.d_params, state.d_params),
    ]:
        moved = any(
            not np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(old), jax.tree_util.tree_leaves(new))
        )
        assert moved, f"{name} never updated"


def test_refine_lr_schedule():
    g_tx, _ = make_refine_optimizers(CFG, steps_per_epoch=10)
    # schedule embedded: verify via the schedule fn behavior through updates
    from mofanerf_tpu.train.refine import RefineConfig

    cfg = RefineConfig(lr=1e-4, niter=2, niter_decay=1)
    from mofanerf_tpu.train.refine import make_refine_optimizers as mk
    import optax

    # direct schedule check
    const = 2 * 10
    decay = 1 * 10

    def sched(step):
        frac = np.clip((step - const) / decay, 0, 1)
        return 1e-4 * (1 - frac)

    assert sched(0) == 1e-4
    assert sched(20) == 1e-4
    assert sched(25) == 5e-5
    assert sched(30) == 0.0


def test_refine_inference_roundtrip():
    state = init_refine_state(jax.random.PRNGKey(3), CFG, image_size=SZ)
    a = jax.random.uniform(jax.random.PRNGKey(4), (2, SZ, SZ, 3)) * 2 - 1
    out = refine_inference(state.g_params, a, CFG)
    assert out.shape == (2, SZ, SZ, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_refine_dataset_pairing(tmp_path):
    import imageio.v2 as imageio
    from mofanerf_tpu.data.refine_dataset import RefinePairDataset

    for sub in ["renders/1/0", "renders/1/5", "gt/1/0", "gt/1/5"]:
        (tmp_path / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for d in ["renders", "gt"]:
        for e in ["0", "5"]:
            for v in range(2):
                img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                imageio.imwrite(str(tmp_path / d / "1" / e / f"{v:02d}.png"), img)
    ds = RefinePairDataset(str(tmp_path / "renders"), str(tmp_path / "gt"), load_size=32)
    assert len(ds) == 4
    a, b = ds.get(0)
    assert a.shape == (32, 32, 3) and b.shape == (32, 32, 3)
    assert a.min() >= -1 and a.max() <= 1
    af, _ = ds.get(0, flip=True)
    np.testing.assert_allclose(af, a[:, ::-1], atol=1e-6)


def test_instance_feature_encoder():
    import jax.numpy as jnp
    from mofanerf_tpu.models.refine.encoder import InstanceFeatureEncoder, instance_average

    enc = InstanceFeatureEncoder(feat_nc=3, ngf=4, n_downsampling=2)
    x = jnp.zeros((1, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(params, x)
    assert feats.shape == (1, 32, 32, 3)

    # instance averaging: two regions -> constant features per region
    f = jnp.arange(16.0).reshape(1, 4, 4, 1)
    inst = jnp.zeros((1, 4, 4), jnp.int32).at[:, :, 2:].set(1)
    avg = instance_average(f, inst)
    a = np.asarray(avg[0, :, :, 0])
    assert np.allclose(a[:, :2], a[0, 0])
    assert np.allclose(a[:, 2:], a[0, 2])
    assert not np.isclose(a[0, 0], a[0, 2])


def test_refine_l1_anchor_and_random_vgg_term():
    """lambda_l1 > 0 plus a fixed random-init VGG perceptual term: the step
    runs finite and, with the adversarial terms dominated (tiny lambdas
    zeroed by construction here), G's output moves TOWARD the target —
    the anchor the round-4 NeRF-corpus study leans on."""
    import dataclasses

    from mofanerf_tpu.models.refine.losses import VGG19Features

    cfg = dataclasses.replace(CFG, lambda_l1=50.0, use_vgg=True)
    state = init_refine_state(jax.random.PRNGKey(0), cfg, image_size=SZ)
    g_tx, d_tx = make_refine_optimizers(cfg)
    vgg = VGG19Features()
    vgg_params = vgg.init(jax.random.PRNGKey(7), jnp.zeros((1, SZ, SZ, 3)))
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, SZ, SZ, 3)) * 2 - 1
    b = jnp.clip(a + 0.2, -1, 1)
    step = jax.jit(lambda s, aa, bb: refine_train_step(
        s, aa, bb, cfg, g_tx, d_tx, vgg_params=vgg_params))

    g, _ = build_models(cfg)
    err0 = float(jnp.mean(jnp.abs(g.apply(state.g_params, a) - b)))
    metrics = None
    for _ in range(8):
        state, metrics = step(state, a, b)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    err1 = float(jnp.mean(jnp.abs(g.apply(state.g_params, a) - b)))
    assert err1 < err0, (err0, err1)
