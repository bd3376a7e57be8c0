"""Whole-fit-as-one-XLA-call: every epoch, validation pass, early-stopping
decision and best-checkpoint snapshot runs inside a single jitted
``lax.while_loop`` on the accelerator.

Motivation (TPU-first redesign of the reference's pl.Trainer.fit,
train_model.py:135-158): the host-side loop in train/loop.py pays several
~65 ms host<->device round trips per epoch on the remote axon backend — the
epoch-plan shuffle (eager jax.random.permutation + fetch), the train/val
dispatches, the metrics device_get, and a device_clone whenever val improves.
At reference scale an epoch computes in ~70 ms, so the loop was RTT-bound.
Here a stage fit is ONE dispatch and ONE small fetch regardless of epoch
count, with the best-(params, bn, opt) snapshot maintained on device via
masked selects.

Shape bucketing: the index stream is zero-padded to a power of two and the
real count travels as a runtime scalar, as do the executed-batch counts and
the epoch/patience budgets — so stages, datasets and learning rates that land
in the same (stream bucket, plan bucket, model config) share ONE compiled
program (the cold-compile lever, RESULTS.md). The per-epoch shuffle is the
canonical bucketed scheme from data.device_data.epoch_shuffle_order; the host
loop (train/loop.py path) builds its plans with the same scheme, so the two
fit loops produce bit-identical trajectories (tests/test_device_fit.py).

Semantics kept from the reference runtime:

  - ModelCheckpoint(save_top_k=1, mode="min"): snapshot on strict val_loss
    improvement (loop.py:154-162);
  - EarlyStopping(patience, min_delta=0): stop once ``wait >= patience``
    after a non-improving epoch (loop.py:163-167);
  - non-finite train loss -> the host wrapper raises FloatingPointError with
    the failing epoch (failure detection, loop.py:124-132);
  - Lightning epoch metric = unweighted mean of per-batch losses over the
    batches that actually executed (masked tail batches stay exact);
  - per-epoch RNG keys derive from (seed, epoch) exactly like loop.fit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.train.loop import FitResult


# Columns of the per-epoch metric buffer.
_COLS = ("train_loss", "val_loss", "train_mse", "train_kl", "val_mse", "val_kl")


def _build_fit(batch_step, eval_step, *, use_class_labels: bool, shuffle: bool,
               batch_size: int, nb_pad: int, plan_sharding=None,
               eval_params_fn=None):
    """The jitted whole-fit program over a tuple of data arrays.

    Static configuration (baked at trace time): ``shuffle``,
    ``use_class_labels``, the plan geometry (nb_pad x batch_size) and the
    stream bucket (from the stream input's shape). Everything else — real
    stream length, executed batch counts, epoch/patience budgets — is runtime.
    """
    from hippie_tpu.data.device_data import epoch_shuffle_order

    nbB = nb_pad * batch_size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit(ts, arrays, source, class_, stream_p, n_real, t_nb,
            v_idx, v_mask, v_nb, root, max_epochs, patience, buf):
        P = stream_p.shape[0]
        nb_val = v_idx.shape[0]

        t_mask = (jnp.arange(nbB) < n_real).astype(jnp.float32).reshape(nb_pad, batch_size)

        # Validation inputs are epoch-invariant: gather once, outside the loop.
        v_arrays = tuple(a[v_idx] for a in arrays)
        v_src = source[v_idx]
        v_cls = class_[v_idx] if use_class_labels else None

        def epoch_plan(pkey):
            s = stream_p
            if shuffle:
                s = stream_p[epoch_shuffle_order(pkey, P, n_real)]
            m = min(P, nbB)  # static
            flat = jnp.zeros((nbB,), jnp.int32).at[:m].set(s[:m])
            idx = flat.reshape(nb_pad, batch_size)
            if plan_sharding is not None:
                idx = jax.lax.with_sharding_constraint(idx, plan_sharding)
            return idx

        zero = jnp.float32(0)

        def cond(c):
            epoch, stop = c[0], c[-1]
            return (epoch < max_epochs) & (~stop)

        def body(c):
            (epoch, ts, best_val, best_epoch, wait, diverged,
             best_params, best_bn, best_opt, buf, _stop) = c
            tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
            vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)

            # ---- train epoch (mirrors step.make_*_epoch_fns bucketed mode) --
            idx = epoch_plan(jax.random.fold_in(tkey, 0))
            b_arrays = tuple(a[idx] for a in arrays)
            bs_all = source[idx]
            bc_all = class_[idx] if use_class_labels else None
            keys = jax.random.split(jax.random.fold_in(tkey, 1), nb_pad)

            def tb(i, carry):
                t, acc = carry
                new_t, m = batch_step(
                    t, *(g[i] for g in b_arrays), bs_all[i],
                    bc_all[i] if use_class_labels else None, t_mask[i], keys[i],
                )
                return new_t, (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

            ts, tacc = jax.lax.fori_loop(0, t_nb, tb, (ts, (zero, zero, zero)))
            t_den = jnp.maximum(t_nb.astype(jnp.float32), 1.0)
            train_loss, train_mse, train_kl = (a / t_den for a in tacc)

            # ---- val epoch --------------------------------------------------
            vkeys = jax.random.split(vkey, nb_val)
            # schedule-free evaluates at the averaged x iterate (optim.
            # maybe_eval_params); identity for plain AdamW.
            vparams = eval_params_fn(ts) if eval_params_fn is not None else ts.params

            def vb(i, acc):
                m = eval_step(
                    vparams, ts.bn_state, *(g[i] for g in v_arrays), v_src[i],
                    v_cls[i] if use_class_labels else None, v_mask[i], vkeys[i],
                )
                return (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl)

            vacc = jax.lax.fori_loop(0, v_nb, vb, (zero, zero, zero))
            v_den = jnp.maximum(v_nb.astype(jnp.float32), 1.0)
            val_loss, val_mse, val_kl = (a / v_den for a in vacc)

            # ---- ModelCheckpoint + EarlyStopping (loop.py:154-167) ----------
            improved = val_loss < best_val
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(improved, n, o), new, old
            )
            best_params = sel(ts.params, best_params)
            best_bn = sel(ts.bn_state, best_bn)
            best_opt = sel(ts.opt_state, best_opt)
            best_val = jnp.where(improved, val_loss, best_val)
            best_epoch = jnp.where(improved, epoch, best_epoch)
            wait = jnp.where(improved, 0, wait + 1)

            bad = ~jnp.isfinite(train_loss)
            stop = bad | (~improved & (wait >= patience))
            buf = buf.at[epoch].set(
                jnp.stack([train_loss, val_loss, train_mse, train_kl, val_mse, val_kl])
            )
            return (epoch + 1, ts, best_val, best_epoch, wait, diverged | bad,
                    best_params, best_bn, best_opt, buf, stop)

        init = (
            jnp.int32(0), ts, jnp.float32(jnp.inf), jnp.int32(-1), jnp.int32(0),
            jnp.bool_(False), ts.params, ts.bn_state, ts.opt_state, buf,
            jnp.bool_(False),
        )
        (epochs_run, ts, best_val, best_epoch, _wait, diverged,
         best_params, best_bn, best_opt, buf, _stop) = jax.lax.while_loop(cond, body, init)
        return (ts, best_params, best_bn, best_opt,
                (epochs_run, best_val, best_epoch, diverged), buf)

    return fit


def device_fit(
    ts,
    *,
    batch_step,
    eval_step,
    arrays: Tuple[jnp.ndarray, ...],
    source: jnp.ndarray,
    class_: jnp.ndarray,
    train_stream: np.ndarray,
    batch_size: int,
    val_idx: jnp.ndarray,
    val_mask: jnp.ndarray,
    val_nb: jnp.ndarray,
    max_epochs: int,
    early_stopping_patience: Optional[int],
    seed: int,
    use_class_labels: bool,
    shuffle: bool,
    limit_train_batches=None,
    plan_sharding=None,
    eval_params_fn=None,
    aot_dir: Optional[str] = None,
    aot_desc: str = "",
    log_fn=None,
    verbose: bool = True,
    lr: Optional[float] = None,
) -> FitResult:
    """Run a full stage fit on device; returns a loop.FitResult.

    Per-epoch verbose prints / log_fn records are replayed after the fit
    completes (the trade-off for zero per-epoch RTTs). ``plan_sharding``
    optionally constrains the generated epoch plans (the dp_devices path).
    """
    from hippie_tpu.data import device_data
    from hippie_tpu.train import loop as loop_mod

    n_real = int(len(train_stream))
    nb_full = max(1, -(-n_real // batch_size))
    n_keep = loop_mod.limit_count(nb_full, limit_train_batches)
    nb_pad = device_data.next_pow2(n_keep, minimum=1)
    P = device_data.next_pow2(n_real, minimum=1)
    stream_p = np.zeros((P,), np.int32)
    stream_p[:n_real] = np.asarray(train_stream, np.int32)

    if max_epochs <= 0:
        return FitResult(
            state=ts, best_params=ts.params, best_bn_state=ts.bn_state,
            best_val_loss=math.inf, best_epoch=-1, epochs_run=0,
            best_opt_state=ts.opt_state, train_losses=[], val_losses=[],
        )

    buf = jnp.full((device_data.next_pow2(max_epochs, minimum=8), len(_COLS)),
                   jnp.nan, jnp.float32)
    patience = early_stopping_patience if early_stopping_patience is not None else 2**31 - 2

    fit = _build_fit(
        batch_step, eval_step,
        use_class_labels=use_class_labels, shuffle=shuffle,
        batch_size=batch_size, nb_pad=nb_pad, plan_sharding=plan_sharding,
        eval_params_fn=eval_params_fn,
    )
    fit_args = (
        ts, tuple(arrays), source, class_, jnp.asarray(stream_p),
        jnp.asarray(n_real, jnp.int32), jnp.asarray(n_keep, jnp.int32),
        val_idx, val_mask, val_nb,
        jax.random.PRNGKey(seed), jnp.asarray(max_epochs, jnp.int32),
        jnp.asarray(patience, jnp.int32), buf,
    )
    if aot_dir is not None and plan_sharding is None:
        static_desc = f"{aot_desc}|ucl={use_class_labels}|sh={shuffle}|B={batch_size}|nb={nb_pad}"
        (final_ts, best_params, best_bn, best_opt, scalars, buf) = _aot_call(
            fit, fit_args, aot_dir, static_desc
        )
    else:
        (final_ts, best_params, best_bn, best_opt, scalars, buf) = fit(*fit_args)
    # ONE host fetch for the loop outcome; model/optimizer states stay on device.
    (epochs_run, best_val, best_epoch, diverged), buf_h = jax.device_get(
        (scalars, buf)
    )
    epochs_run = int(epochs_run)
    best_epoch = int(best_epoch)
    rows = buf_h[:epochs_run]

    # Match loop.fit's failure path: it raises BEFORE printing/logging the
    # diverged epoch, so don't replay the NaN record either.
    n_replay = epochs_run - 1 if bool(diverged) else epochs_run
    for e in range(n_replay):
        rec = dict(zip(_COLS, (float(x) for x in rows[e])))
        if verbose:
            print(f"Average training loss is {rec['train_loss']:.2f}")
            print(f"Average validation loss is {rec['val_loss']:.2f}")
        if log_fn is not None:
            out = {"epoch": e, "train_loss": rec["train_loss"], "val_loss": rec["val_loss"],
                   "train_mse": rec["train_mse"], "train_kl": rec["train_kl"],
                   "val_mse": rec["val_mse"], "val_kl": rec["val_kl"]}
            if lr is not None:
                out["lr"] = float(lr)
            log_fn(out)

    if bool(diverged):
        bad_epoch = epochs_run - 1
        raise FloatingPointError(
            f"non-finite training loss at epoch {bad_epoch}: "
            f"{rows[bad_epoch][0]} (val={rows[bad_epoch][1]}); "
            "lower the learning rate or enable clipping"
        )

    if best_epoch < 0:  # no improvement recorded (shouldn't happen: inf start)
        best_params, best_bn, best_opt = final_ts.params, final_ts.bn_state, final_ts.opt_state

    return FitResult(
        state=final_ts,
        best_params=best_params,
        best_bn_state=best_bn,
        best_val_loss=float(best_val),
        best_epoch=best_epoch,
        epochs_run=epochs_run,
        best_opt_state=best_opt,
        train_losses=[float(r[0]) for r in rows],
        val_losses=[float(r[1]) for r in rows],
    )


# ---------------------------------------------------------------------------
# AOT program cache (jax.export) — skip per-process trace/lowering
# ---------------------------------------------------------------------------

_REGISTERED_NT: set = set()


def _register_io_namedtuples(tree) -> None:
    """Register every namedtuple type in a pytree for jax.export
    serialization (names are module.qualname — stable across processes)."""
    from jax import export as jexport

    def visit(obj):
        t = type(obj)
        if hasattr(t, "_fields"):
            if t not in _REGISTERED_NT:
                _REGISTERED_NT.add(t)
                try:
                    jexport.register_namedtuple_serialization(
                        t, serialized_name=f"{t.__module__}.{t.__qualname__}"
                    )
                except ValueError:
                    pass  # registered elsewhere
            for f in obj._fields:
                visit(getattr(obj, f))
        elif isinstance(obj, (tuple, list)):
            for c in obj:
                visit(c)
        elif isinstance(obj, dict):
            for c in obj.values():
                visit(c)

    visit(tree)


def _aot_cache_key(args: tuple, static_desc: str) -> str:
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = "|".join(f"{tuple(l.shape)}:{l.dtype}" for l in leaves)
    raw = f"{jax.__version__}|{jax.default_backend()}|{static_desc}|{treedef}|{sig}"
    return hashlib.sha256(raw.encode()).hexdigest()[:24]


def _aot_call(fit, args: tuple, aot_dir: str, static_desc: str):
    """Run ``fit(*args)`` through the on-disk AOT program cache: the traced +
    lowered stage-fit program is serialized once (jax.export) and later
    processes deserialize it in ~0.2 s instead of re-tracing for ~4-10 s on
    the single host core (measured, RESULTS.md). Donation is not preserved
    by exported calls — one extra transient copy of the train state."""
    import os

    from jax import export as jexport

    _register_io_namedtuples(args)
    os.makedirs(aot_dir, exist_ok=True)
    path = os.path.join(aot_dir, f"fit_{_aot_cache_key(args, static_desc)}.shlo")
    exported = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exported = jexport.deserialize(f.read())
        except Exception:
            exported = None  # stale/corrupt entry: fall through to re-export
    if exported is None:
        exported = jexport.export(fit)(*args)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exported.serialize())
        os.replace(tmp, path)
    return exported.call(*args)
