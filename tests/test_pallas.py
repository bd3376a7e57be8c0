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


def test_pallas_loss_backend_in_train_step():
    """The loss_backend='pallas' step factory trains end to end (interpret mode)."""
    import optax

    from hippie_tpu.data.device_data import batch_plan
    from hippie_tpu.models import cvae
    from hippie_tpu.train import optim, step

    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    p, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1e-3, 0.01)
    ts = step.TrainState(p, bn, tx.init(p))
    te, ee = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=False, loss_backend="pallas")
    data = jnp.asarray(np.random.default_rng(0).normal(size=(32, 50)).astype(np.float32))
    src = jnp.zeros((32,), jnp.int32)
    idx, mask = batch_plan(np.arange(32), 16, shuffle=False)
    ts, ms = te(ts, data, src, src, jnp.asarray(idx), jnp.asarray(mask), jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(ms.loss)))

    # and it matches the XLA-loss step on the same inputs
    p2, bn2 = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    ts2 = step.TrainState(p2, bn2, tx.init(p2))
    te2, _ = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=False, loss_backend="xla")
    ts2, ms2 = te2(ts2, data, src, src, jnp.asarray(idx), jnp.asarray(mask), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ms.loss), np.asarray(ms2.loss), rtol=1e-5, atol=1e-6)


def test_multimodal_fused_loss_matches_xla():
    from hippie_tpu.ops.pallas_ops import multimodal_vae_loss_pallas

    d1, dec1, mu, logvar = _inputs(b=16, l=50)
    d2, dec2, _, _ = _inputs(b=16, l=100, seed=1)
    mask = jnp.asarray(np.array([1.0] * 12 + [0.0] * 4, np.float32))
    ref_t, (rm1, rm2, rkl) = losses.multimodal_vae_loss(
        d1, d2, dec1, dec2, mu, logvar, beta=0.7, mod1_weight=0.5, mod2_weight=2.0, mask=mask
    )
    got_t, (m1, m2, kl) = multimodal_vae_loss_pallas(
        d1, d2, dec1, dec2, mu, logvar, beta=0.7, mod1_weight=0.5, mod2_weight=2.0, mask=mask
    )
    np.testing.assert_allclose(float(got_t), float(ref_t), rtol=1e-6)
    np.testing.assert_allclose(float(m2), float(rm2), rtol=1e-6)

    def f_ref(dec1, dec2, mu, logvar):
        return losses.multimodal_vae_loss(d1, d2, dec1, dec2, mu, logvar, beta=0.7, mask=mask)[0]

    def f_pal(dec1, dec2, mu, logvar):
        return multimodal_vae_loss_pallas(d1, d2, dec1, dec2, mu, logvar, beta=0.7, mask=mask)[0]

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(dec1, dec2, mu, logvar)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2, 3))(dec1, dec2, mu, logvar)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)
