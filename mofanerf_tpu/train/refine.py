"""RefineNet (pix2pixHD) adversarial training — one jitted G+D step.

Capability parity with the reference trainer (run_train_refineNet.py:23-150
+ tools/refine_mod/models/pix2pixHD_model.py:69-205):
  loss_G = LSGAN(D(A, G(A)), real) + lambda_feat * feat_match + lambda_feat * VGG
  loss_D = 0.5 * (LSGAN(D(A, G(A)).detach, fake) + LSGAN(D(A, B), real))
two Adams (lr=1e-4, beta1=0.5 — train_options.py), constant lr for `niter`
epochs then linear decay over `niter_decay` (pix2pixHD_model.py:305-314).

Differences from the reference (deliberate):
- The shipped trainer has a stray sys.exit() that kills it after one
  iteration (run_train_refineNet.py:106) — obviously not replicated.
- Both G and D update in ONE jitted step (two optax transforms, one
  compiled program) instead of two sequential backward passes.
- The VGG term requires ported torchvision weights (zero-egress env);
  pass vgg_params=None to drop the term (reference's --no_vgg_loss).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mofanerf_tpu.models.refine.generator import GlobalGenerator
from mofanerf_tpu.models.refine.discriminator import MultiscaleDiscriminator
from mofanerf_tpu.models.refine.losses import (
    lsgan_loss,
    feature_matching_loss,
    VGG19Features,
    vgg_perceptual_loss,
)


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    ngf: int = 32
    ndf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    num_D: int = 2
    n_layers_D: int = 3
    lr: float = 1e-4
    beta1: float = 0.5
    lambda_feat: float = 10.0
    use_vgg: bool = True
    # L1 reconstruction anchor on G's output (beyond reference parity,
    # default off). On small corpora the GAN+featmatch objective alone can
    # trade PSNR for texture hallucination (measured −1.0 dB on the round-3
    # NeRF corpus, artifacts/refine_nerf_quality.json r3); a pixel anchor
    # pins the identity solution while the adversarial terms add detail.
    lambda_l1: float = 0.0
    niter: int = 19          # epochs at constant lr
    niter_decay: int = 1     # epochs of linear decay
    load_size: int = 512


class RefineState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def build_models(cfg: RefineConfig):
    g = GlobalGenerator(output_nc=3, ngf=cfg.ngf,
                        n_downsampling=cfg.n_downsampling, n_blocks=cfg.n_blocks)
    d = MultiscaleDiscriminator(ndf=cfg.ndf, n_layers=cfg.n_layers_D, num_D=cfg.num_D)
    return g, d


def make_refine_optimizers(cfg: RefineConfig, steps_per_epoch: int = 1):
    """Adam pair with the reference's epoch-wise schedule, expressed per
    step: constant for niter epochs, then linear to 0 over niter_decay."""
    const = cfg.niter * steps_per_epoch
    decay = max(1, cfg.niter_decay * steps_per_epoch)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip((step - const) / decay, 0.0, 1.0)
        return cfg.lr * (1.0 - frac)

    mk = lambda: optax.adam(learning_rate=sched, b1=cfg.beta1, b2=0.999)
    return mk(), mk()


def init_refine_state(
    key: jax.Array, cfg: RefineConfig, steps_per_epoch: int = 1, image_size: int = 64
) -> RefineState:
    g, d = build_models(cfg)
    kg, kd = jax.random.split(key)
    dummy = jnp.zeros((1, image_size, image_size, 3))
    g_params = g.init(kg, dummy)
    d_params = d.init(kd, jnp.concatenate([dummy, dummy], axis=-1))
    g_tx, d_tx = make_refine_optimizers(cfg, steps_per_epoch)
    return RefineState(
        g_params, d_params, g_tx.init(g_params), d_tx.init(d_params),
        jnp.asarray(0, jnp.int32),
    )


def refine_train_step(
    state: RefineState,
    input_a: jnp.ndarray,    # [B, H, W, 3] NeRF render, in [-1, 1]
    real_b: jnp.ndarray,     # [B, H, W, 3] ground truth, in [-1, 1]
    cfg: RefineConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    vgg_params: Optional[Any] = None,
):
    """One adversarial step. D conditions on concat(A, image) like
    pix2pixHD's discriminate() (pix2pixHD_model.py:176-186)."""
    g, d = build_models(cfg)
    vgg = VGG19Features()

    def g_loss_fn(g_params, d_params):
        fake = g.apply(g_params, input_a)
        pred_fake = d.apply(d_params, jnp.concatenate([input_a, fake], axis=-1))
        pred_real = d.apply(d_params, jnp.concatenate([input_a, real_b], axis=-1))
        loss_gan = lsgan_loss(pred_fake, is_real=True)
        loss_feat = cfg.lambda_feat * feature_matching_loss(
            pred_fake, pred_real, cfg.n_layers_D, cfg.num_D
        )
        loss_vgg = 0.0
        if cfg.use_vgg and vgg_params is not None:
            loss_vgg = cfg.lambda_feat * vgg_perceptual_loss(vgg, vgg_params, fake, real_b)
        loss_l1 = cfg.lambda_l1 * jnp.mean(jnp.abs(fake - real_b))
        total = loss_gan + loss_feat + loss_vgg + loss_l1
        return total, (fake, loss_gan, loss_feat, loss_vgg)

    (g_total, (fake, l_gan, l_feat, l_vgg)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(state.g_params, state.d_params)

    def d_loss_fn(d_params):
        fake_det = jax.lax.stop_gradient(fake)
        pred_fake = d.apply(d_params, jnp.concatenate([input_a, fake_det], axis=-1))
        pred_real = d.apply(d_params, jnp.concatenate([input_a, real_b], axis=-1))
        return 0.5 * (lsgan_loss(pred_fake, False) + lsgan_loss(pred_real, True))

    d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)

    g_up, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    d_up, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
    new = RefineState(
        optax.apply_updates(state.g_params, g_up),
        optax.apply_updates(state.d_params, d_up),
        g_opt, d_opt, state.step + 1,
    )
    metrics = {
        "loss_G": g_total, "loss_D": d_total,
        "G_GAN": l_gan, "G_feat": l_feat, "G_VGG": l_vgg,
    }
    return new, metrics


def refine_inference(g_params, input_a: jnp.ndarray, cfg: RefineConfig) -> jnp.ndarray:
    """G(A) for a batch of renders in [-1, 1] (run_refine.py path)."""
    g, _ = build_models(cfg)
    return g.apply(g_params, input_a)
