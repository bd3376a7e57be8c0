"""Pallas fused loss kernel vs the XLA reference implementation (interpret
mode on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.ops import losses
from hippie_tpu.ops.pallas_ops import vae_loss_pallas


def _inputs(b=32, l=50, z=10, seed=0):
    r = np.random.default_rng(seed)
    return (
        jnp.asarray(r.normal(size=(b, l)).astype(np.float32)),
        jnp.asarray(r.normal(size=(b, l)).astype(np.float32)),
        jnp.asarray(r.normal(size=(b, z)).astype(np.float32)),
        jnp.asarray(r.normal(size=(b, z)).astype(np.float32) * 0.3),
    )


def test_fused_loss_matches_xla():
    data, dec, mu, logvar = _inputs()
    ref_total, (ref_mse, ref_kl) = losses.vae_loss(data, dec, mu, logvar, beta=0.7)
    got_total, (got_mse, got_kl) = vae_loss_pallas(data, dec, mu, logvar, beta=0.7)
    np.testing.assert_allclose(float(got_total), float(ref_total), rtol=1e-6)
    np.testing.assert_allclose(float(got_mse), float(ref_mse), rtol=1e-6)
    np.testing.assert_allclose(float(got_kl), float(ref_kl), rtol=1e-6)


def test_fused_loss_masked():
    data, dec, mu, logvar = _inputs(b=16)
    mask = jnp.asarray(np.array([1.0] * 10 + [0.0] * 6, np.float32))
    ref_total, _ = losses.vae_loss(data, dec, mu, logvar, beta=1.0, mask=mask)
    got_total, _ = vae_loss_pallas(data, dec, mu, logvar, beta=1.0, mask=mask)
    np.testing.assert_allclose(float(got_total), float(ref_total), rtol=1e-6)
    # padded rows must be invisible
    small_total, _ = losses.vae_loss(data[:10], dec[:10], mu[:10], logvar[:10], beta=1.0)
    np.testing.assert_allclose(float(got_total), float(small_total), rtol=1e-6)


def test_fused_loss_gradients_match_xla():
    data, dec, mu, logvar = _inputs(b=8)
    mask = jnp.asarray(np.array([1.0] * 6 + [0.0] * 2, np.float32))

    def f_ref(dec, mu, logvar):
        t, _ = losses.vae_loss(data, dec, mu, logvar, beta=0.5, mask=mask)
        return t

    def f_pal(dec, mu, logvar):
        t, _ = vae_loss_pallas(data, dec, mu, logvar, beta=0.5, mask=mask)
        return t

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(dec, mu, logvar)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(dec, mu, logvar)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)
