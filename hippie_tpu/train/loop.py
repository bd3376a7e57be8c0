"""Training loop: epochs, early stopping, best-checkpoint tracking.

Replaces the pl.Trainer layer (reference L3, SURVEY.md §1). Semantics kept:
  - per-epoch validation; monitored metric is the unweighted mean of per-batch
    val losses (Lightning's default epoch aggregation of ``self.log``);
  - ModelCheckpoint(monitor="val_loss", save_top_k=1, mode="min")
    (train_model.py:125-126): best state is snapshotted whenever val_loss
    strictly improves;
  - EarlyStopping(patience, mode="min", min_delta=0) (train_model.py:127-128);
  - limit_train_batches / limit_val_batches as fractions or counts
    (train_model.py:39-40).

The loop body is host-side orchestration only; each epoch is a single jitted
scan (hippie_tpu/train/step.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def device_clone(tree):
    """Deep-copy a pytree's device buffers in ONE compiled call.

    Per-leaf eager jnp.copy pays a dispatch round trip per leaf on remote
    backends (~minutes for optimizer+param trees); this is a single dispatch.
    """
    return jax.tree_util.tree_map(jnp.copy, tree)


def limit_count(nb: int, limit) -> int:
    """Lightning-style batch limit (None | float fraction | int count) -> count."""
    if limit is None:
        return nb
    n = max(1, int(limit * nb)) if isinstance(limit, float) and limit <= 1.0 else int(limit)
    return min(nb, max(1, n))


def limit_batches(plan, limit):
    """Apply a Lightning-style limit to a (idx, mask) batch plan."""
    idx, mask = plan
    n = limit_count(idx.shape[0], limit)
    return idx[:n], mask[:n]


@dataclass
class FitResult:
    state: Any  # final TrainState
    best_params: Any
    best_bn_state: Any
    best_val_loss: float
    best_epoch: int
    epochs_run: int
    best_opt_state: Any = None
    train_losses: List[float] = field(default_factory=list)
    val_losses: List[float] = field(default_factory=list)


def fit(
    state,
    *,
    run_train_epoch: Callable[[Any, Any, int], tuple],
    run_val_epoch: Callable[[Any, Any, int], Any],
    max_epochs: int,
    early_stopping_patience: Optional[int] = None,
    seed: int = 42,
    log_fn: Optional[Callable[[dict], None]] = None,
    verbose: bool = True,
    resume_dir: Optional[str] = None,
    lr: Optional[float] = None,
) -> FitResult:
    """Generic fit driver.

    run_train_epoch(state, key, epoch) -> (state, metrics)   # metrics.loss [nb]
    run_val_epoch(state, key, epoch)   -> metrics            # metrics.loss [nb]

    ``resume_dir``: when set, full state (params/BN/optimizer/loop counters)
    is checkpointed to that orbax directory after every epoch and restored on
    the next call — exact mid-run resume, which the reference lacks
    (SURVEY.md §5). Per-epoch RNG derives from (seed, epoch), so the resumed
    trajectory matches an uninterrupted run.
    """
    root = jax.random.PRNGKey(seed)
    best_val = math.inf
    best_epoch = -1
    best_params = state.params
    best_bn = state.bn_state
    best_opt = state.opt_state
    wait = 0
    train_losses, val_losses = [], []
    start_epoch = 0

    if resume_dir is not None:
        from hippie_tpu.train import orbax_io

        resumed = orbax_io.resume_fit_state(resume_dir, state)
        if resumed is not None:
            last_epoch, state, extras, best = resumed
            start_epoch = last_epoch + 1
            best_val = float(extras.get("best_val", math.inf))
            best_epoch = int(extras.get("best_epoch", -1))
            wait = int(extras.get("wait", 0))
            if best is not None:
                # The persisted best snapshot: without it, a resumed run whose
                # remaining epochs never improve would return the resume-point
                # weights labeled with the pre-crash best metrics.
                best_params, best_bn, best_opt = best
            else:  # legacy resume dir without a best_* checkpoint
                best_params, best_bn, best_opt = state.params, state.bn_state, state.opt_state
            if verbose:
                print(f"Resumed from {resume_dir} at epoch {start_epoch}")

    if (start_epoch > 0 and early_stopping_patience is not None
            and wait >= early_stopping_patience):
        # The restored state says this stage already early-stopped: running
        # even one more epoch would diverge from the uninterrupted trajectory
        # (and keep extending on every restart). Return the completed result.
        if verbose:
            print(f"Early stopping already triggered at epoch {start_epoch - 1}; "
                  "nothing to resume")
        max_epochs = start_epoch

    epochs_run = start_epoch
    for epoch in range(start_epoch, max_epochs):
        tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
        vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)
        state, tms = run_train_epoch(state, tkey, epoch)
        vms = run_val_epoch(state, vkey, epoch)
        # ONE host transfer for all per-epoch metrics (each separate fetch
        # pays a ~65 ms round trip on remote backends).
        tms_h, vms_h = jax.device_get((tms, vms))
        train_loss = float(np.mean(tms_h.loss))
        val_loss = float(np.mean(vms_h.loss))
        if not math.isfinite(train_loss):
            # Failure detection (the reference has none, SURVEY.md §5): a
            # non-finite loss means diverged training — fail loudly with
            # context instead of silently optimizing NaNs for the remaining
            # epochs.
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}: {train_loss} "
                f"(val={val_loss}); lower the learning rate or enable clipping"
            )
        train_losses.append(train_loss)
        val_losses.append(val_loss)
        epochs_run = epoch + 1
        if verbose:
            # Matches the reference's per-epoch prints (model.py:141-149).
            print(f"Average training loss is {train_loss:.2f}")
            print(f"Average validation loss is {val_loss:.2f}")
        if log_fn is not None:
            # Per-epoch loss/mse/kl (+ lr when the caller supplies it) — the
            # reference logs all of these each epoch (model.py:111-113,135-149;
            # LearningRateMonitor, train_model.py:354-355).
            rec = {"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss}
            for name, ms in (("train", tms_h), ("val", vms_h)):
                if getattr(ms, "mse", None) is not None:
                    rec[f"{name}_mse"] = float(np.mean(ms.mse))
                if getattr(ms, "kl", None) is not None:
                    rec[f"{name}_kl"] = float(np.mean(ms.kl))
            if lr is not None:
                rec["lr"] = float(lr)
            log_fn(rec)

        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            # Real device copies: the live state's buffers get donated to the
            # next epoch's jit call, which would invalidate mere aliases.
            best_params, best_bn, best_opt = device_clone(
                (state.params, state.bn_state, state.opt_state)
            )
            wait = 0
        else:
            wait += 1
            stop_early = early_stopping_patience is not None and wait >= early_stopping_patience
            if stop_early and resume_dir is None:
                break

        if resume_dir is not None:
            # Deliberate ordering: the epoch state is saved BEFORE the
            # patience break so a restart resumes from the stopping epoch;
            # epochs run and final states match the non-resume path. The best
            # snapshot rides along only on epochs that improved it.
            from hippie_tpu.train import orbax_io

            orbax_io.save_fit_state(
                resume_dir, epoch, state,
                {"best_val": best_val, "best_epoch": best_epoch, "wait": wait},
                best=((best_params, best_bn, best_opt, best_epoch)
                      if best_epoch == epoch else None),
            )
            if early_stopping_patience is not None and wait >= early_stopping_patience:
                break

    if best_epoch < 0:  # no validation ran (max_epochs=0)
        best_params, best_bn, best_opt = state.params, state.bn_state, state.opt_state

    return FitResult(
        state=state,
        best_params=best_params,
        best_bn_state=best_bn,
        best_val_loss=best_val,
        best_epoch=best_epoch,
        epochs_run=epochs_run,
        best_opt_state=best_opt,
        train_losses=train_losses,
        val_losses=val_losses,
    )
