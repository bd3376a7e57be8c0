"""Single-compile fused train/eval steps and epoch-as-scan builders.

Design (TPU-first, replaces the reference's Lightning per-batch Python loop,
train_model.py:135-158):

- the whole preprocessed dataset is device-resident; a batch is a gather;
- one train step = forward + loss + backward + AdamW update, traced once and
  fused by XLA (reconstruction MSE + beta-KL + reparameterization included);
- a full epoch is ONE jit call: ``lax.scan`` over a [num_batches, B] index
  plan, with a per-sample mask making the padded tail batch exact;
- reparameterization noise comes from a per-step folded PRNG key.

Factories return jitted callables; ``donate`` moves params/opt-state in place
to avoid HBM copies.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from hippie_tpu.models import cvae
from hippie_tpu.ops import losses


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any


class Metrics(NamedTuple):
    loss: jnp.ndarray
    mse: jnp.ndarray
    kl: jnp.ndarray


def _select_vae_loss(loss_backend: str):
    if loss_backend == "pallas":
        from hippie_tpu.ops.pallas_ops import vae_loss_pallas

        return vae_loss_pallas
    return losses.vae_loss


def make_unimodal_steps(
    tx: optax.GradientTransformation,
    *,
    beta: float = 1.0,
    use_class_labels: bool = False,
    loss_backend: str = "xla",
    block_backend: str = "xla",
):
    """Build the per-batch (batch_step, eval_step) pair for the unimodal cVAE.

    batch_step(ts, bd, bs, bc, bmask, brng) -> (ts, Metrics)   # fwd+bwd+AdamW
    eval_step(params, bn, bd, bs, bc, bmask, brng) -> Metrics  # running stats

    Shared by the epoch runners below and by train.device_fit (the whole-fit
    while_loop). ``use_class_labels`` is consumed by the callers (they pass
    bc=None when False); it is accepted here for signature symmetry.
    """
    del use_class_labels
    vae_loss = _select_vae_loss(loss_backend)

    def batch_step(ts: TrainState, bd, bs, bc, bmask, brng):
        def loss_fn(params):
            (enc, mu, logvar, dec), new_bn = cvae.unimodal_cvae_apply(
                params, ts.bn_state, bd, bs, bc, rng=brng, training=True, mask=bmask,
                backend=block_backend,
            )
            total, (mse, kl) = vae_loss(bd, dec, mu, logvar, beta=beta, mask=bmask)
            return total, (new_bn, mse, kl)

        (loss, (new_bn, mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return TrainState(new_params, new_bn, new_opt), Metrics(loss, mse, kl)

    def eval_step(params, bn_state, bd, bs, bc, bmask, brng):
        (enc, mu, logvar, dec), _ = cvae.unimodal_cvae_apply(
            params, bn_state, bd, bs, bc, rng=brng, training=False, mask=bmask
        )
        total, (mse, kl) = vae_loss(bd, dec, mu, logvar, beta=beta, mask=bmask)
        return Metrics(total, mse, kl)

    return batch_step, eval_step


def make_unimodal_epoch_fns(
    tx: optax.GradientTransformation,
    *,
    beta: float = 1.0,
    use_class_labels: bool = False,
    modality: str = "wave",
    loss_backend: str = "xla",
    block_backend: str = "xla",
):
    """Build (train_epoch, eval_epoch) for the unimodal cVAE.

    train_epoch(ts, data, source, class_, idx, mask, rng) -> (ts, Metrics[nb])
    eval_epoch(params, bn_state, data, source, class_, idx, mask) -> Metrics[nb]

    ``data`` is the full [N, L] modality array; ``idx``/``mask`` are the
    [nb, B] epoch plan from data.device_data.batch_plan. Loss follows
    model.py:95-116: mse over elements + beta * mean KL; eval uses running BN
    stats but still samples the reparameterization like the reference's
    validation_step (model.py:118-139). ``loss_backend='pallas'`` swaps in the
    hand-fused Pallas loss kernel (ops/pallas_ops.py); ``block_backend=
    'pallas'`` runs every backbone BasicBlock as one fused megakernel with a
    hand-written backward (ops/pallas_blocks.py) — training steps only, eval
    stays on the XLA path ('bf16' likewise trains with bfloat16 block
    activations while eval stays fp32).
    """
    batch_step, eval_step = make_unimodal_steps(
        tx, beta=beta, loss_backend=loss_backend, block_backend=block_backend,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(ts: TrainState, data, source, class_, idx, mask, rng, n_batches=None):
        keys = jax.random.split(rng, idx.shape[0])
        # ONE whole-epoch gather instead of a small gather kernel per step
        # (~0.2 ms/step measured at batch 512); the loop then consumes free
        # leading-axis slices of the [nb, B, ...] arrays.
        bd_all = data[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        if n_batches is None:
            # static plan: scan over every row, per-batch Metrics
            def body(carry, xs):
                bd, bs, bc, bmask, brng = xs
                new_ts, m = batch_step(
                    carry, bd, bs, bc if use_class_labels else None, bmask, brng
                )
                return new_ts, m

            ts, ms = jax.lax.scan(body, ts, (bd_all, bs_all, bc_all, mask, keys))
            return ts, ms

        # bucketed plan: the [nb_bucket, B] arrays are shape-padded so one
        # compiled program serves every dataset/stage; only the first
        # n_batches (runtime scalar) execute, and Metrics are scalar means
        def fbody(i, carry):
            ts, acc = carry
            new_ts, m = batch_step(
                ts, bd_all[i], bs_all[i],
                bc_all[i] if use_class_labels else None, mask[i], keys[i],
            )
            return new_ts, (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

        zero = jnp.float32(0)
        ts, acc = jax.lax.fori_loop(0, n_batches, fbody, (ts, (zero, zero, zero)))
        nb = jnp.maximum(n_batches.astype(jnp.float32), 1.0)
        return ts, Metrics(acc[0] / nb, acc[1] / nb, acc[2] / nb)

    @jax.jit
    def eval_epoch(params, bn_state, data, source, class_, idx, mask, rng, n_batches=None):
        keys = jax.random.split(rng, idx.shape[0])
        bd_all = data[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        def one(bd, bs, bc, bmask, brng):
            return eval_step(
                params, bn_state, bd, bs, bc if use_class_labels else None, bmask, brng
            )

        if n_batches is None:
            def body(carry, xs):
                bd, bs, bc, bmask, brng = xs
                return carry, one(bd, bs, bc if use_class_labels else None, bmask, brng)

            _, ms = jax.lax.scan(body, None, (bd_all, bs_all, bc_all, mask, keys))
            return ms

        def fbody(i, acc):
            m = one(bd_all[i], bs_all[i],
                    bc_all[i] if use_class_labels else None, mask[i], keys[i])
            return (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

        zero = jnp.float32(0)
        acc = jax.lax.fori_loop(0, n_batches, fbody, (zero, zero, zero))
        nb = jnp.maximum(n_batches.astype(jnp.float32), 1.0)
        return Metrics(acc[0] / nb, acc[1] / nb, acc[2] / nb)

    return train_epoch, eval_epoch


def _select_multimodal_loss(loss_backend: str):
    if loss_backend == "pallas":
        from hippie_tpu.ops.pallas_ops import multimodal_vae_loss_pallas

        return multimodal_vae_loss_pallas
    return losses.multimodal_vae_loss


def make_multimodal_steps(
    tx: optax.GradientTransformation,
    *,
    beta: float = 1.0,
    mod1_weight: float = 1.0,
    mod2_weight: float = 1.0,
    loss_backend: str = "xla",
    block_backend: str = "xla",
):
    """Per-batch (batch_step, eval_step) for the joint MultiModalCVAE —
    the two-data-array counterpart of make_unimodal_steps."""
    multimodal_vae_loss = _select_multimodal_loss(loss_backend)

    def batch_step(ts: TrainState, b1, b2, bs, bc, bmask, brng):
        def loss_fn(params):
            (enc, mu, logvar, d1, d2), new_bn = cvae.multimodal_cvae_apply(
                params, ts.bn_state, b1, b2, bs, bc, rng=brng, training=True, mask=bmask,
                backend=block_backend,
            )
            total, (mse1, mse2, kl) = multimodal_vae_loss(
                b1, b2, d1, d2, mu, logvar,
                beta=beta, mod1_weight=mod1_weight, mod2_weight=mod2_weight, mask=bmask,
            )
            return total, (new_bn, mse1 + mse2, kl)

        (loss, (new_bn, mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return TrainState(new_params, new_bn, new_opt), Metrics(loss, mse, kl)

    def eval_step(params, bn_state, b1, b2, bs, bc, bmask, brng):
        (enc, mu, logvar, d1, d2), _ = cvae.multimodal_cvae_apply(
            params, bn_state, b1, b2, bs, bc, rng=brng, training=False, mask=bmask
        )
        total, (mse1, mse2, kl) = multimodal_vae_loss(
            b1, b2, d1, d2, mu, logvar,
            beta=beta, mod1_weight=mod1_weight, mod2_weight=mod2_weight, mask=bmask,
        )
        return Metrics(total, mse1 + mse2, kl)

    return batch_step, eval_step


def make_multimodal_epoch_fns(
    tx: optax.GradientTransformation,
    *,
    beta: float = 1.0,
    mod1_weight: float = 1.0,
    mod2_weight: float = 1.0,
    use_class_labels: bool = False,
    loss_backend: str = "xla",
    block_backend: str = "xla",
):
    """Build (train_epoch, eval_epoch) for the joint MultiModalCVAE.

    Same shape contract as the unimodal fns but with (wave, isi) arrays.
    Loss follows model.py:454-482.
    """
    batch_step, eval_step = make_multimodal_steps(
        tx, beta=beta, mod1_weight=mod1_weight, mod2_weight=mod2_weight,
        loss_backend=loss_backend, block_backend=block_backend,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(ts: TrainState, wave, isi, source, class_, idx, mask, rng, n_batches=None):
        keys = jax.random.split(rng, idx.shape[0])
        b1_all, b2_all = wave[idx], isi[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        if n_batches is None:
            def body(carry, xs):
                b1, b2, bs, bc, bmask, brng = xs
                return batch_step(
                    carry, b1, b2, bs, bc if use_class_labels else None, bmask, brng
                )

            ts, ms = jax.lax.scan(body, ts, (b1_all, b2_all, bs_all, bc_all, mask, keys))
            return ts, ms

        def fbody(i, carry):
            ts, acc = carry
            new_ts, m = batch_step(
                ts, b1_all[i], b2_all[i], bs_all[i],
                bc_all[i] if use_class_labels else None, mask[i], keys[i],
            )
            return new_ts, (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

        zero = jnp.float32(0)
        ts, acc = jax.lax.fori_loop(0, n_batches, fbody, (ts, (zero, zero, zero)))
        nb = jnp.maximum(n_batches.astype(jnp.float32), 1.0)
        return ts, Metrics(acc[0] / nb, acc[1] / nb, acc[2] / nb)

    @jax.jit
    def eval_epoch(params, bn_state, wave, isi, source, class_, idx, mask, rng, n_batches=None):
        keys = jax.random.split(rng, idx.shape[0])
        b1_all, b2_all = wave[idx], isi[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        def one(b1, b2, bs, bc, bmask, brng):
            return eval_step(params, bn_state, b1, b2, bs, bc, bmask, brng)

        if n_batches is None:
            def body(carry, xs):
                b1, b2, bs, bc, bmask, brng = xs
                return carry, one(b1, b2, bs, bc if use_class_labels else None, bmask, brng)

            _, ms = jax.lax.scan(body, None, (b1_all, b2_all, bs_all, bc_all, mask, keys))
            return ms

        def fbody(i, acc):
            m = one(b1_all[i], b2_all[i], bs_all[i],
                    bc_all[i] if use_class_labels else None, mask[i], keys[i])
            return (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

        zero = jnp.float32(0)
        acc = jax.lax.fori_loop(0, n_batches, fbody, (zero, zero, zero))
        nb = jnp.maximum(n_batches.astype(jnp.float32), 1.0)
        return Metrics(acc[0] / nb, acc[1] / nb, acc[2] / nb)

    return train_epoch, eval_epoch
