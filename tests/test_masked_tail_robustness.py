"""Degenerate masked tail batches must stay finite.

A balanced supervised stream whose length is 1 mod batch_size yields a tail
batch with ONE real sample. Batch stats then exclude every padded row, each
[B, C] BatchNorm sees batch variance 0 and scales index-0-padded rows by
~1/sqrt(eps); stacked through the fc chains the padded activations reach
~1e7+, exp(logvar) overflows, and an unguarded mask-multiply computes
inf*0 = NaN — poisoning the epoch (the torch reference crashes outright on a
1-row BatchNorm1d batch, so it never sees this). Two defenses, both pinned
here:

1. The batch plans pad the tail with its own LAST REAL index
   (data/device_data.py::{batch_plan,host_epoch_plan}, train/device_fit.py
   epoch_plan) — an in-batch duplicate normalizes exactly like the sample it
   copies, so every activation stays bounded at ZERO in-step cost (per-BN
   where() guards measured a 16% train-step regression and were removed).
2. The losses still guard their inputs with where()
   (ops/losses.py::_guard_rows, ops/pallas_ops.py kernels) — cheap one-time
   defense in depth should any caller hand-build a zero-padded batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.ops import losses
from hippie_tpu.ops.pallas_ops import vae_loss_pallas


def _overflow_inputs(b=8, l=12, z=6, n_real=2, inf_pads=False):
    r = np.random.default_rng(0)
    data = r.normal(size=(b, l)).astype(np.float32)
    dec = r.normal(size=(b, l)).astype(np.float32)
    mu = r.normal(size=(b, z)).astype(np.float32)
    logvar = (r.normal(size=(b, z)) * 0.3).astype(np.float32)
    # padded rows carry blown-up activations: exp(logvar) overflows to inf.
    # inf_pads=True is the fully-degenerate case (pads already inf on entry):
    # every mask-multiply — including in the VJPs — must where()-guard first.
    pad = np.float32(np.inf) if inf_pads else np.float32(1.0)
    dec[n_real:] = 3e7 * pad
    mu[n_real:] = 1e7 * pad
    logvar[n_real:] = 1e5 * pad
    mask = np.zeros((b,), np.float32)
    mask[:n_real] = 1.0
    return (jnp.asarray(data), jnp.asarray(dec), jnp.asarray(mu),
            jnp.asarray(logvar), jnp.asarray(mask), n_real)


def test_vae_loss_finite_with_overflowing_padded_rows():
    data, dec, mu, logvar, mask, n_real = _overflow_inputs()
    total, (mse, kl) = losses.vae_loss(data, dec, mu, logvar, beta=1.0, mask=mask)
    assert np.isfinite(float(total)) and np.isfinite(float(mse)) and np.isfinite(float(kl))
    # identical to the unpadded batch of just the real rows
    ref, _ = losses.vae_loss(data[:n_real], dec[:n_real], mu[:n_real],
                             logvar[:n_real], beta=1.0)
    np.testing.assert_allclose(float(total), float(ref), rtol=1e-6)

    # gradients must be finite too (the 0-cotangent * inf-primal VJP trap)
    def f(dec, mu, logvar):
        t, _ = losses.vae_loss(data, dec, mu, logvar, beta=1.0, mask=mask)
        return t

    grads = jax.grad(f, argnums=(0, 1, 2))(dec, mu, logvar)
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_multimodal_vae_loss_finite_with_overflowing_padded_rows():
    data, dec, mu, logvar, mask, n_real = _overflow_inputs()
    total, (mse1, mse2, kl) = losses.multimodal_vae_loss(
        data, data, dec, dec, mu, logvar, beta=1.0, mask=mask)
    assert np.isfinite(float(total))
    ref, _ = losses.multimodal_vae_loss(
        data[:n_real], data[:n_real], dec[:n_real], dec[:n_real],
        mu[:n_real], logvar[:n_real], beta=1.0)
    np.testing.assert_allclose(float(total), float(ref), rtol=1e-6)

    def f(dec, mu, logvar):
        t, _ = losses.multimodal_vae_loss(data, data, dec, dec, mu, logvar,
                                          beta=1.0, mask=mask)
        return t

    grads = jax.grad(f, argnums=(0, 1, 2))(dec, mu, logvar)
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_pallas_loss_finite_with_overflowing_padded_rows():
    data, dec, mu, logvar, mask, n_real = _overflow_inputs()
    total, _ = vae_loss_pallas(data, dec, mu, logvar, beta=1.0, mask=mask)
    assert np.isfinite(float(total))
    ref, _ = losses.vae_loss(data[:n_real], dec[:n_real], mu[:n_real],
                             logvar[:n_real], beta=1.0)
    np.testing.assert_allclose(float(total), float(ref), rtol=1e-6)

    def f(dec, mu, logvar):
        t, _ = vae_loss_pallas(data, dec, mu, logvar, beta=1.0, mask=mask)
        return t

    grads = jax.grad(f, argnums=(0, 1, 2))(dec, mu, logvar)
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_pallas_losses_grads_finite_with_inf_padded_rows():
    """Fully-degenerate pads (already inf on entry): both fused kernels'
    custom VJPs must where()-guard before their mask-multiplies — the
    unimodal _bwd_kernel's dmu term and multimodal's _sse_bwd once computed
    inf*0 = NaN here."""
    from hippie_tpu.ops.pallas_ops import multimodal_vae_loss_pallas

    data, dec, mu, logvar, mask, n_real = _overflow_inputs(inf_pads=True)

    def f_uni(dec, mu, logvar):
        t, _ = vae_loss_pallas(data, dec, mu, logvar, beta=1.0, mask=mask)
        return t

    total, grads = jax.value_and_grad(f_uni, argnums=(0, 1, 2))(dec, mu, logvar)
    assert np.isfinite(float(total))
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g

    def f_mm(dec2, mu, logvar):
        t, _ = multimodal_vae_loss_pallas(
            data, data, dec, dec2, mu, logvar, beta=1.0, mask=mask)
        return t

    total, grads = jax.value_and_grad(f_mm, argnums=(0, 1, 2))(dec, mu, logvar)
    assert np.isfinite(float(total))
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_plan_pads_duplicate_last_real_sample():
    """All three plan builders pad with the tail's last real index, and the
    host/device builders agree bit-for-bit (trajectory contract)."""
    from hippie_tpu.data import device_data as dd

    # batch_plan: pads = last real of the tail batch
    idx, mask = dd.batch_plan(np.arange(7, 12), 4, shuffle=False)
    np.testing.assert_array_equal(idx[-1], [11, 11, 11, 11])

    # host_epoch_plan vs the traced pad fill device_fit's epoch_plan uses
    # (data/device_data.py::plan_pad_duplicate), same key/geometry
    key = jax.random.PRNGKey(3)
    stream = np.arange(10, 23, dtype=np.int32)  # 13 real, batch 4 -> tail of 1
    h_idx, h_mask, h_nb = dd.host_epoch_plan(stream, 4, shuffle=True, key=key)
    n_real = len(stream)
    P = dd.next_pow2(n_real, minimum=1)
    sp = np.zeros((P,), np.int32)
    sp[:n_real] = stream
    s = jnp.asarray(sp)[dd.epoch_shuffle_order(key, P, n_real)]
    nbB = h_idx.size
    m = min(P, nbB)
    flat = jnp.zeros((nbB,), jnp.int32).at[:m].set(s[:m])
    flat = dd.plan_pad_duplicate(flat, n_real)
    np.testing.assert_array_equal(np.asarray(flat).reshape(h_idx.shape), h_idx)
    # every pad slot duplicates the last real sample of the shuffled stream
    assert (h_idx.reshape(-1)[n_real:] == h_idx.reshape(-1)[n_real - 1]).all()


def test_supervised_epoch_survives_one_real_sample_tail_batch():
    """End-to-end: the full model trains through a mask-sum-1 tail batch."""
    from hippie_tpu.data import sampling
    from hippie_tpu.data.device_data import batch_plan
    from hippie_tpu.models import cvae
    from hippie_tpu.train import optim, step

    n = 32
    labels = np.arange(n) % 3
    bal = sampling.balanced_indices(labels, seed=0)
    idx, mask = batch_plan(bal, 16, shuffle=False)
    assert mask.sum(axis=1).min() == 1.0  # the degenerate tail this test pins

    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5,
                          num_sources=5, num_classes=5)
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=1.0)
    data = jnp.asarray(np.random.default_rng(0).normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(6), cfg)
    ts = step.TrainState(params, bn, tx.init(params))
    sup_epoch, _ = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=True)
    ts2, metrics = sup_epoch(ts, data, source, jnp.asarray(labels, jnp.int32),
                             jnp.asarray(idx), jnp.asarray(mask), jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(metrics.loss)).all(), np.asarray(metrics.loss)
    for leaf in jax.tree_util.tree_leaves(ts2.params):
        assert bool(jnp.isfinite(leaf).all())
    for leaf in jax.tree_util.tree_leaves(ts2.bn_state):
        assert bool(jnp.isfinite(leaf).all())
