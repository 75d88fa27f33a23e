"""Adversarial losses.

Two regimes, matching the two apps in the reference:

* SRN ``GANLoss`` (reference: codes/SRN/models/modules/loss.py:8-40):
  'vanilla' = BCE-with-logits against a 1/0 target, 'lsgan' = MSE,
  'wgan-gp' = signed mean; plus the relativistic-average (RaGAN) pairing
  used by SRRaGAN/DASR (reference: codes/SRN/models/DASR_model.py:240-244).
  Discriminator bodies emit *logits* in this regime.

* DSN script losses (reference: codes/DSN/loss.py:11-41): the discriminator
  already applies a sigmoid, and the losses are the -log(d + 1e-8) forms.
  The log is computed in f32 regardless of compute dtype (bf16-safe island).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _bce_with_logits(logits, target):
    # mean(max(x,0) - x*t + log(1+exp(-|x|)))
    x = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))


def gan_loss(pred: jax.Array, target_is_real: bool, gan_type: str = "vanilla"):
    """SRN GANLoss parity; ``pred`` are logits ('vanilla'/'lsgan') or raw ('wgan')."""
    t = 1.0 if target_is_real else 0.0
    if gan_type == "vanilla":
        return _bce_with_logits(pred, t)
    if gan_type == "lsgan":
        p = pred.astype(jnp.float32)
        return jnp.mean((p - t) ** 2)
    if gan_type in ("wgan", "wgan-gp"):
        p = pred.astype(jnp.float32)
        return -jnp.mean(p) if target_is_real else jnp.mean(p)
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def ragan_pair_loss(pred_fake, pred_real_detached, gan_type: str = "vanilla"):
    """Relativistic-average generator-side pair (DASR_model.py:240-244)."""
    rf = pred_fake - jnp.mean(pred_real_detached, axis=0, keepdims=True)
    fr = pred_real_detached - jnp.mean(pred_fake, axis=0, keepdims=True)
    return (gan_loss(rf, True, gan_type) + gan_loss(fr, False, gan_type)) / 2


def dsn_generator_adv_loss(fake_scores, wasserstein: bool = False):
    """DSN generator texture loss on sigmoided D outputs (DSN/loss.py:11-22)."""
    s = fake_scores.astype(jnp.float32)
    if wasserstein:
        return jnp.mean(-s)
    return jnp.mean(-jnp.log(s + _EPS))


def dsn_discriminator_loss(
    real_scores, fake_scores, wasserstein: bool = False, grad_penalty=0.0
):
    """DSN discriminator loss on sigmoided outputs (DSN/loss.py:25-41)."""
    r = real_scores.astype(jnp.float32)
    f = fake_scores.astype(jnp.float32)
    if wasserstein:
        return -jnp.mean(r) + jnp.mean(f) + grad_penalty
    return -jnp.mean(jnp.log(r + _EPS)) - jnp.mean(jnp.log(1 - f + _EPS))


def gradient_penalty(d_apply, real, fake, key):
    """WGAN-GP penalty (reference: codes/SRN/models/modules/loss.py:43-62).

    ``d_apply`` maps an image batch to raw D outputs. The interpolation
    point is one uniform scalar per sample, as in the reference.
    """
    b = real.shape[0]
    alpha = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    interp = real + alpha * (fake - real)

    def d_sum(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
