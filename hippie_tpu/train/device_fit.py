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
               eval_params_fn=None, log_steps: bool = False):
    """The jitted whole-fit program over a tuple of data arrays.

    Static configuration (baked at trace time): ``shuffle``,
    ``use_class_labels``, ``log_steps``, the plan geometry (nb_pad x
    batch_size) and the stream bucket (from the stream input's shape).
    Everything else — real stream length, executed batch counts,
    epoch/patience budgets — is runtime.

    The loop state travels as an explicit ``carry`` argument and the epoch
    budget is a runtime scalar, so the host can run the SAME compiled
    program in chunks (epoch_budget = k, 2k, ...) for live progress between
    chunks — the trajectory is identical because all per-epoch RNG derives
    from (root, epoch). With ``log_steps`` the carry also threads a
    [E, nb_pad, 3] per-train-batch metric buffer (reference per-step
    ``self.log``, model.py:111-113).
    """
    from hippie_tpu.data.device_data import epoch_shuffle_order
    from hippie_tpu.data.device_data import plan_pad_duplicate as device_data_plan_pad

    nbB = nb_pad * batch_size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit(carry, arrays, source, class_, stream_p, n_real, t_nb,
            v_idx, v_mask, v_nb, root, epoch_budget, patience):
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
            # Pad slots duplicate the last real sample (bit-identical to
            # data.device_data.host_epoch_plan): an in-batch copy stays
            # bounded through masked BN even in the 1-real-sample tail,
            # where zero-index pads amplified to inf (see batch_plan).
            flat = device_data_plan_pad(flat, n_real)
            idx = flat.reshape(nb_pad, batch_size)
            if plan_sharding is not None:
                idx = jax.lax.with_sharding_constraint(idx, plan_sharding)
            return idx

        zero = jnp.float32(0)

        def cond(c):
            epoch, stop = c[0], c[-1]
            return (epoch < epoch_budget) & (~stop)

        def body(c):
            (epoch, ts, best_val, best_epoch, wait, diverged,
             best_params, best_bn, best_opt, buf, sbuf, _stop) = c
            tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
            vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)

            # ---- train epoch (mirrors step.make_*_epoch_fns bucketed mode) --
            idx = epoch_plan(jax.random.fold_in(tkey, 0))
            b_arrays = tuple(a[idx] for a in arrays)
            bs_all = source[idx]
            bc_all = class_[idx] if use_class_labels else None
            keys = jax.random.split(jax.random.fold_in(tkey, 1), nb_pad)

            def tb(i, carry):
                t, acc, sbuf = carry
                new_t, m = batch_step(
                    t, *(g[i] for g in b_arrays), bs_all[i],
                    bc_all[i] if use_class_labels else None, t_mask[i], keys[i],
                )
                if log_steps:
                    sbuf = sbuf.at[epoch, i].set(jnp.stack([m.loss, m.mse, m.kl]))
                return new_t, (acc[0] + m.loss, acc[1] + m.mse, acc[2] + m.kl), sbuf

            ts, tacc, sbuf = jax.lax.fori_loop(0, t_nb, tb, (ts, (zero, zero, zero), sbuf))
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
                    best_params, best_bn, best_opt, buf, sbuf, stop)

        return jax.lax.while_loop(cond, body, carry)

    return fit


@jax.jit
def _init_carry(ts, buf, sbuf, epoch, best_val, best_epoch, wait, best3=None):
    # The best_* seeds must be COPIES of the live state: the whole carry is
    # donated to the fit program, and donating the same buffer twice (ts.params
    # aliasing best_params) is an execution error. The loop counters are
    # runtime scalars so fresh starts and --resume restarts share one program.
    # ``best3``: a restored best snapshot (params, bn, opt) from --resume —
    # fresh orbax buffers, never aliased to ts, so they seed the best slots
    # directly.
    best = (best3 if best3 is not None else
            jax.tree_util.tree_map(jnp.copy, (ts.params, ts.bn_state, ts.opt_state)))
    return (
        jnp.asarray(epoch, jnp.int32), ts, jnp.asarray(best_val, jnp.float32),
        jnp.asarray(best_epoch, jnp.int32), jnp.asarray(wait, jnp.int32),
        jnp.bool_(False), *best, buf, sbuf,
        jnp.bool_(False),
    )


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
    progress_every: Optional[int] = None,
    log_steps: bool = False,
    resume_dir: Optional[str] = None,
) -> FitResult:
    """Run a full stage fit on device; returns a loop.FitResult.

    ``progress_every``: run the (one) compiled fit program in epoch chunks of
    this size, printing/logging completed epochs between chunks — live
    progress at the cost of one dispatch + small fetch per chunk (the
    trajectory is identical: per-epoch RNG derives from (seed, epoch)). None
    = single dispatch, logs replayed after the stage. ``log_steps`` threads a
    per-train-batch metric buffer through the fit and emits one
    ``{train_loss_step, ...}`` record per executed batch to ``log_fn`` (the
    reference's per-step self.log granularity, model.py:111-113).
    ``plan_sharding`` optionally constrains the generated epoch plans (the
    dp_devices path).

    ``resume_dir``: orbax mid-run resume, same on-disk format as the host
    loop (train/orbax_io.py) — the two fit loops can resume each other's
    interrupted stages. Forces chunked execution (cadence = progress_every,
    default every epoch for host-loop durability parity) and persists
    (TrainState, best_val/best_epoch/wait) after each chunk, plus the best
    snapshot whenever it advanced (so a restart returns the TRUE best weights
    even when no post-resume epoch improves). Per-epoch RNG derives from
    (seed, epoch), so the resumed trajectory bit-matches an uninterrupted
    run. Legacy resume dirs without a best_* checkpoint fall back to
    re-tracking the best from the resume point.
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

    start_epoch, best_val0, best_epoch0, wait0, best0 = 0, math.inf, -1, 0, None
    if resume_dir is not None:
        from hippie_tpu.train import orbax_io

        resumed = orbax_io.resume_fit_state(resume_dir, ts)
        if resumed is not None:
            last_epoch, ts, extras, best0 = resumed
            start_epoch = last_epoch + 1
            best_val0 = float(extras.get("best_val", math.inf))
            best_epoch0 = int(extras.get("best_epoch", -1))
            wait0 = int(extras.get("wait", 0))
            if verbose:
                print(f"Resumed from {resume_dir} at epoch {start_epoch}")

    e_pad = device_data.next_pow2(max_epochs, minimum=8)
    buf = jnp.full((e_pad, len(_COLS)), jnp.nan, jnp.float32)
    sbuf = (jnp.full((e_pad, nb_pad, 3), jnp.nan, jnp.float32) if log_steps
            else jnp.zeros((0,), jnp.float32))
    patience = early_stopping_patience if early_stopping_patience is not None else 2**31 - 2

    if (start_epoch > 0 and early_stopping_patience is not None
            and wait0 >= early_stopping_patience):
        # The restored counters say this stage already early-stopped; running
        # even one more epoch would diverge from the uninterrupted trajectory
        # (and keep extending on every restart). Return the completed result.
        if verbose:
            print(f"Early stopping already triggered at epoch {start_epoch - 1}; "
                  "nothing to resume")
        bp, bb, bo = (best0 if best0 is not None
                      else (ts.params, ts.bn_state, ts.opt_state))
        return FitResult(
            state=ts, best_params=bp, best_bn_state=bb,
            best_val_loss=best_val0, best_epoch=best_epoch0,
            epochs_run=start_epoch, best_opt_state=bo,
            train_losses=[], val_losses=[],
        )

    fit = _build_fit(
        batch_step, eval_step,
        use_class_labels=use_class_labels, shuffle=shuffle,
        batch_size=batch_size, nb_pad=nb_pad, plan_sharding=plan_sharding,
        eval_params_fn=eval_params_fn, log_steps=log_steps,
    )
    mid_args = (
        tuple(arrays), source, class_, jnp.asarray(stream_p),
        jnp.asarray(n_real, jnp.int32), jnp.asarray(n_keep, jnp.int32),
        val_idx, val_mask, val_nb, jax.random.PRNGKey(seed),
    )
    patience_arr = jnp.asarray(patience, jnp.int32)
    # Executable-format cache entries carry their shardings, so dp runs
    # (plan_sharding set) are cacheable too; the jax.export fallback is not.
    use_aot = aot_dir is not None and (
        plan_sharding is None or _have_exec_serialization()
    )
    static_desc = (f"{aot_desc}|ucl={use_class_labels}|sh={shuffle}|B={batch_size}|"
                   f"nb={nb_pad}|ls={log_steps}")

    def run_chunk(carry, epoch_budget: int):
        args = (carry, *mid_args, jnp.asarray(epoch_budget, jnp.int32), patience_arr)
        if use_aot:
            return _aot_call(fit, args, aot_dir, static_desc)
        return fit(*args)

    def emit(rec_rows, start_epoch):
        """Print/log per-epoch records for rows [start_epoch, ...)."""
        for off, row in enumerate(rec_rows):
            e = start_epoch + off
            rec = dict(zip(_COLS, (float(x) for x in row)))
            if verbose:
                print(f"Average training loss is {rec['train_loss']:.2f}")
                print(f"Average validation loss is {rec['val_loss']:.2f}")
            if log_fn is not None:
                out = {"epoch": e, "train_loss": rec["train_loss"],
                       "val_loss": rec["val_loss"],
                       "train_mse": rec["train_mse"], "train_kl": rec["train_kl"],
                       "val_mse": rec["val_mse"], "val_kl": rec["val_kl"]}
                if lr is not None:
                    out["lr"] = float(lr)
                log_fn(out)

    carry = _init_carry(ts, buf, sbuf, start_epoch, best_val0, best_epoch0, wait0,
                        best3=best0)
    emitted = start_epoch
    chunk = int(progress_every) if (progress_every and progress_every > 0) else None
    if resume_dir is not None and chunk is None:
        chunk = 1  # per-epoch durability, matching the host loop's cadence
    if chunk is not None:
        budget = start_epoch
        last_saved = start_epoch - 1
        last_best_saved = best_epoch0
        while True:
            budget = min(budget + chunk, max_epochs)
            carry = run_chunk(carry, budget)
            # one small fetch per chunk: loop scalars + the new metric rows
            epochs_done, stop, diverged_now, bv, be, wt = jax.device_get(
                (carry[0], carry[-1], carry[5], carry[2], carry[3], carry[4])
            )
            epochs_done, stop, diverged_now = int(epochs_done), bool(stop), bool(diverged_now)
            if epochs_done > emitted:
                rows_new = np.asarray(jax.device_get(carry[9][emitted:epochs_done]))
                # hold back the diverged (NaN) epoch: loop.fit raises before
                # printing/logging it
                n_emit = len(rows_new) - 1 if diverged_now else len(rows_new)
                emit(rows_new[:n_emit], emitted)
                emitted = epochs_done - (1 if diverged_now else 0)
            if (resume_dir is not None and not diverged_now
                    and epochs_done - 1 > last_saved):
                # Host-loop parity: the diverged epoch is never persisted, the
                # early-stopping epoch is (a restart resumes from it). The
                # best snapshot (carry slots 6-8) rides along whenever it
                # advanced during this chunk — without it a crash after the
                # best epoch would lose the best weights (the Lightning ckpt
                # is flushed lazily at pipeline end).
                from hippie_tpu.train import orbax_io

                orbax_io.save_fit_state(
                    resume_dir, epochs_done - 1, carry[1],
                    {"best_val": float(bv), "best_epoch": int(be), "wait": int(wt)},
                    best=((carry[6], carry[7], carry[8], int(be))
                          if int(be) > last_best_saved else None),
                )
                last_saved = epochs_done - 1
                last_best_saved = max(last_best_saved, int(be))
            if stop or diverged_now or epochs_done >= max_epochs:
                break
    else:
        carry = run_chunk(carry, max_epochs)

    (_e, final_ts, _bv, _be, _w, _d, best_params, best_bn, best_opt,
     buf_d, sbuf_d, _s) = carry
    (epochs_run, best_val, best_epoch, diverged), buf_h = jax.device_get(
        ((carry[0], carry[2], carry[3], carry[5]), buf_d)
    )
    epochs_run = int(epochs_run)
    best_epoch = int(best_epoch)
    rows = buf_h[:epochs_run]

    # Match loop.fit's failure path: it raises BEFORE printing/logging the
    # diverged epoch, so don't replay the NaN record either.
    n_replay = epochs_run - 1 if bool(diverged) else epochs_run
    if emitted < n_replay:
        emit(rows[emitted:n_replay], emitted)

    if log_steps and log_fn is not None and n_replay > start_epoch:
        srows = np.asarray(jax.device_get(sbuf_d[:n_replay, :n_keep]))
        for e in range(start_epoch, n_replay):
            for i in range(n_keep):
                log_fn({
                    "epoch": e, "step": e * n_keep + i,
                    "train_loss_step": float(srows[e, i, 0]),
                    "train_mse_step": float(srows[e, i, 1]),
                    "train_kl_step": float(srows[e, i, 2]),
                })

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
        # Like loop.fit after a resume, the loss lists cover only the epochs
        # THIS call ran (pre-resume rows were never computed here).
        train_losses=[float(r[0]) for r in rows[start_epoch:]],
        val_losses=[float(r[1]) for r in rows[start_epoch:]],
    )


# ---------------------------------------------------------------------------
# AOT program cache — shared machinery lives in hippie_tpu.utils.aot
# ---------------------------------------------------------------------------

from hippie_tpu.utils import aot as _aot  # noqa: E402

_register_io_namedtuples = _aot.register_io_namedtuples
_source_revision = _aot.source_revision
_aot_cache_key = _aot.cache_key
_have_exec_serialization = _aot.have_exec_serialization


def _aot_call(fit, args: tuple, aot_dir: str, static_desc: str):
    """Run ``fit(*args)`` through the on-disk AOT program cache (see
    hippie_tpu/utils/aot.py for format, keying and fallback details)."""
    return _aot.cached_call(fit, args, aot_dir, static_desc)
