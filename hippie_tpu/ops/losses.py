"""cVAE loss functions (reconstruction MSE + beta-weighted KL).

Reference math (hippie/model.py:103-109, 284-289):
  mse = F.mse_loss(data, dec)                                 # mean over all elems
  kl  = -0.5 * sum(1 + logvar - mu^2 - exp(logvar), axis=1)   # per-sample
  loss = mse + beta * kl.mean()

All functions accept an optional per-sample ``mask`` so a padded tail batch in
a statically-shaped epoch scan contributes exactly the unpadded-batch loss.

The XLA implementation below is fully fused by the compiler into the train
step; hippie_tpu/ops/pallas_ops.py provides a hand-fused Pallas kernel for the
elementwise+reduction path used on TPU benches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: Optional[jax.Array], per_sample_elems: int):
    """Mean of x over all elements, counting only rows with mask=1."""
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    mb = m.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.sum(x * mb) / (jnp.sum(m) * per_sample_elems)


def _guard_rows(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero out padded rows BEFORE any nonlinearity in the loss.

    Padded rows are excluded from batch statistics, so their activations are
    unconstrained — in the degenerate 1-real-sample batch (a balanced stream
    whose length is 1 mod batch_size) every [B, C] BatchNorm has batch var 0
    and scales padded rows by ~1/sqrt(eps), stacking to ~1e7. ``exp(logvar)``
    then overflows and the mask-multiply computes inf*0 = NaN, poisoning the
    whole epoch. where() on the inputs keeps both values and gradients finite
    (a plain mask-multiply of the per-row loss would still NaN in the VJP:
    0-cotangent times the inf primal). Real-row math is untouched.
    """
    if mask is None:
        return x
    mb = (mask != 0).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mb, x, jnp.zeros((), x.dtype))


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Per-sample KL(N(mu, sigma^2) || N(0, 1)), summed over the latent axis."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1)


def vae_loss(
    data: jax.Array,
    dec: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    beta: float = 1.0,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Unimodal loss. data/dec: [B, L]; mu/logvar: [B, z].

    Returns (total, (mse, kl_mean)).
    """
    mu = _guard_rows(mu, mask)
    logvar = _guard_rows(logvar, mask)
    mse = _masked_mean(jnp.square(_guard_rows(data - dec, mask)), mask, data.shape[1])
    kl = _masked_mean(kl_divergence(mu, logvar), mask, 1)
    return mse + beta * kl, (mse, kl)


def multimodal_vae_loss(
    data1: jax.Array,
    data2: jax.Array,
    dec1: jax.Array,
    dec2: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    beta: float = 1.0,
    mod1_weight: float = 1.0,
    mod2_weight: float = 1.0,
    mask: Optional[jax.Array] = None,
):
    """Joint loss (model.py:465-474). Returns (total, (mse1, mse2, kl_mean))."""
    mu = _guard_rows(mu, mask)
    logvar = _guard_rows(logvar, mask)
    mse1 = _masked_mean(jnp.square(_guard_rows(data1 - dec1, mask)), mask, data1.shape[1])
    mse2 = _masked_mean(jnp.square(_guard_rows(data2 - dec2, mask)), mask, data2.shape[1])
    kl = _masked_mean(kl_divergence(mu, logvar), mask, 1)
    total = mod1_weight * mse1 + mod2_weight * mse2 + beta * kl
    return total, (mse1, mse2, kl)
