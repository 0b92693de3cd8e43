"""GAN losses with the reference's exact scaling.

Rebuild of the loss math in src_deformable/models/pose_gan.py:69-171. The
reference accumulates per-sample python-loop terms; vectorized here, the
sums are identical:

- generator adversarial (pose_gan.py:90-98):
  ``gan_w/batch · Σ_i mean_patches(-log(D_i + 1e-7))``
- discriminator (pose_gan.py:140-164): true rows get ``-log(D + 1e-7)``,
  fake rows ``-log(1 - D + 1e-7)``, each summed per-sample-mean and scaled
  ``gan_w/batch``.
- reconstruction (pose_gan.py:100-105): plain L1 mean when no content layer,
  else ``nn_loss`` between VGG features; scaled by ``l1_w``.

All reductions are in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def _per_sample_mean(x: jnp.ndarray) -> jnp.ndarray:
    """(N, P) patch values → (N,) per-sample means."""
    return jnp.mean(x, axis=-1)


def gen_adversarial_loss(disc_out_fake: jnp.ndarray, gan_weight: float,
                         batch_size: int) -> jnp.ndarray:
    """Saturating log-loss toward 'real' on the generator's samples.

    Probabilities upcast to f32 *before* the +eps/log — in bf16 the eps
    underflows against 1.0 and the log output loses all resolution.
    """
    p = disc_out_fake.astype(jnp.float32)
    per_sample = _per_sample_mean(-jnp.log(p + EPS))
    return jnp.sum(per_sample) * gan_weight / batch_size


def disc_adversarial_loss(disc_out_real: jnp.ndarray,
                          disc_out_fake: jnp.ndarray, gan_weight: float,
                          batch_size: int):
    """(true_loss, fake_loss) with the reference's per-side scaling."""
    p_real = disc_out_real.astype(jnp.float32)
    p_fake = disc_out_fake.astype(jnp.float32)
    true_loss = jnp.sum(_per_sample_mean(
        -jnp.log(p_real + EPS))) * gan_weight / batch_size
    fake_loss = jnp.sum(_per_sample_mean(
        -jnp.log(1.0 - p_fake + EPS))) * gan_weight / batch_size
    return true_loss, fake_loss


def l1_loss(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.L1Loss default: mean absolute error over all elements."""
    return jnp.mean(jnp.abs(predicted.astype(jnp.float32) -
                            target.astype(jnp.float32)))


def total_variation_loss(x: jnp.ndarray) -> jnp.ndarray:
    """TV penalty (--tv_penalty_weight, default 0 and unused in the
    reference's training runs; implemented for flag completeness)."""
    dy = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dx = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    return jnp.mean(dy) + jnp.mean(dx)
