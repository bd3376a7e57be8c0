"""Orbax-native checkpointing and mid-run resume.

The reference has NO mid-run resume: stages always restart from the best
previous Lightning ckpt (SURVEY.md §5). Here every fit can additionally
persist its full state (params, BN stats, optimizer state, loop counters)
to an orbax directory each epoch and resume exactly where it stopped —
complementing the Lightning-.ckpt interop in train/checkpoint.py, which
remains the cross-framework contract format.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _complete_entries(directory: str, prefix: str) -> list:
    """COMPLETE checkpoints under ``directory`` named ``<prefix><6 digits>``,
    sorted. A process killed mid-save leaves ``<name>.orbax-checkpoint-tmp-*``
    dirs; a bare startswith() filter would pick such a tmp as the resume
    source (it sorts after the last complete epoch) and restore garbage —
    caught live by killing a pipeline mid-epoch-save."""
    import re

    pat = re.compile(re.escape(prefix) + r"\d{6}$")
    try:
        names = os.listdir(directory)
    except OSError:
        return []
    return sorted(n for n in names if pat.fullmatch(n))


def save_fit_state(directory: str, epoch: int, state, extras: dict, best=None):
    """Persist TrainState + loop bookkeeping for ``resume_fit_state``.

    ``best``: optional ``(best_params, best_bn, best_opt, best_epoch)``. The
    best snapshot is crash-critical state: without it, a restart whose
    remaining epochs never beat the restored ``best_val`` would silently
    return the RESUME-POINT weights labeled with the pre-crash best metrics
    (the Lightning best ckpt is flushed lazily by the pipeline trackers, so
    it is not on disk yet either). Callers pass it only when the best
    advanced since their last save, so steady-state saves stay one tree.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    import shutil

    if best is not None:
        b_params, b_bn, b_opt, b_epoch = best
        bpath = os.path.join(directory, f"best_{int(b_epoch):06d}")
        _checkpointer().save(
            bpath,
            {"params": b_params, "bn_state": b_bn, "opt_state": b_opt},
            force=True,
        )
        for stale in _complete_entries(directory, "best_")[:-2]:
            shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)
    payload = {
        "epoch": np.asarray(epoch),
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "extras": {k: np.asarray(v) for k, v in extras.items()},
    }
    path = os.path.join(directory, f"epoch_{epoch:06d}")
    _checkpointer().save(path, payload, force=True)
    # keep only the latest two epochs; also reap tmp dirs from crashed saves
    for stale in _complete_entries(directory, "epoch_")[:-2]:
        shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)
    # PyTreeCheckpointer.save is blocking, so any tmp left now is from a
    # previous crashed save of this (single-writer) resume dir.
    for leftover in os.listdir(directory):
        if ".orbax-checkpoint-tmp" in leftover:
            shutil.rmtree(os.path.join(directory, leftover), ignore_errors=True)


def latest_fit_state(directory: str) -> Optional[str]:
    # orbax/tensorstore refuses relative paths on restore (save abspaths
    # above); the CLI default checkpoint dir is the relative "checkpoints".
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    entries = _complete_entries(directory, "epoch_")
    return os.path.join(directory, entries[-1]) if entries else None


def _replace_on_template(tree, template):
    # Re-place every leaf on the TEMPLATE's sharding: under --dp-devices /
    # --fsdp the live TrainState is replicated / per-leaf sharded over the
    # mesh, and the fit programs require their inputs on that mesh — orbax
    # restores to default single-device placement, which would otherwise mix
    # devices in one jit call. Pure placement: the resumed trajectory is
    # unchanged.
    import jax

    return jax.tree_util.tree_map(
        lambda x, t: jax.device_put(x, t.sharding) if hasattr(t, "sharding") else x,
        tree,
        template,
    )


def save_ensemble_fit_state(directory: str, epoch: int, state, extras: dict, best):
    """Ensemble twin of ``save_fit_state``: persist a stacked K-replica
    TrainState + [K] loop counters + the stacked per-replica best snapshot.

    The best snapshot (``best = (best_params, best_bn)``) travels IN the
    epoch payload rather than a sidecar ``best_`` dir: per-replica bests
    advance on most epochs (any one of K replicas improving), so the
    conditional-save economy of the single-model format buys nothing, and
    one atomic payload removes the cross-dir trust protocol entirely — a
    crash can never leave a best snapshot the loop counters don't match.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    import shutil

    payload = {
        "epoch": np.asarray(epoch),
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "best_params": best[0],
        "best_bn": best[1],
        "extras": {k: np.asarray(v) for k, v in extras.items()},
    }
    path = os.path.join(directory, f"epoch_{epoch:06d}")
    _checkpointer().save(path, payload, force=True)
    for stale in _complete_entries(directory, "epoch_")[:-2]:
        shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)
    for leftover in os.listdir(directory):
        if ".orbax-checkpoint-tmp" in leftover:
            shutil.rmtree(os.path.join(directory, leftover), ignore_errors=True)


def resume_ensemble_fit_state(directory: str, state_template) -> Optional[Tuple[int, Any, dict, Any]]:
    """Restore (epoch, TrainState, extras, (best_params, best_bn)) for an
    interrupted ``device_fit_ensemble`` run; None when no complete save
    exists. Leaves re-place on the template's shardings (mesh-sharded
    replica ensembles resume onto the same mesh placement)."""
    import jax

    path = latest_fit_state(directory)
    if path is None:
        return None
    k = jax.tree_util.tree_leaves(state_template.params)[0].shape[0]
    template = {
        "epoch": np.asarray(0),
        "params": state_template.params,
        "bn_state": state_template.bn_state,
        "opt_state": state_template.opt_state,
        "best_params": state_template.params,
        "best_bn": state_template.bn_state,
        "extras": {
            "best_val": np.zeros((k,), np.float32),
            "best_epoch": np.zeros((k,), np.int32),
            "wait": np.zeros((k,), np.int32),
        },
    }
    restored = _checkpointer().restore(path, item=template)
    new_state = type(state_template)(
        restored["params"], restored["bn_state"], restored["opt_state"]
    )
    new_state = _replace_on_template(new_state, state_template)
    best = _replace_on_template(
        (restored["best_params"], restored["best_bn"]),
        (state_template.params, state_template.bn_state),
    )
    return int(restored["epoch"]), new_state, restored.get("extras") or {}, best


def resume_fit_state(directory: str, state_template) -> Optional[Tuple[int, Any, dict, Any]]:
    """Restore (epoch, TrainState, extras, best) from the latest saved epoch.

    ``best`` is the persisted best snapshot ``(params, bn_state, opt_state)``
    when a ``best_{extras['best_epoch']}`` checkpoint exists (see
    ``save_fit_state``), else None — a None means the caller can only
    re-track the best from the resume point onward (legacy resume dirs)."""
    path = latest_fit_state(directory)
    if path is None:
        return None
    template = {
        "epoch": np.asarray(0),
        "params": state_template.params,
        "bn_state": state_template.bn_state,
        "opt_state": state_template.opt_state,
        "extras": {
            "best_val": np.asarray(0.0),
            "best_epoch": np.asarray(0),
            "wait": np.asarray(0),
        },
    }
    restored = _checkpointer().restore(path, item=template)
    new_state = type(state_template)(
        restored["params"], restored["bn_state"], restored["opt_state"]
    )
    new_state = _replace_on_template(new_state, state_template)
    extras = restored.get("extras") or {}

    best = None
    best_epoch = int(np.asarray(extras.get("best_epoch", -1)))
    directory = os.path.abspath(directory)
    bpath = os.path.join(directory, f"best_{best_epoch:06d}")
    # Only trust a best dir that matches the restored counters: a crash
    # between the best write and the epoch write can leave a NEWER best dir
    # than the epoch state knows about — re-tracking re-creates it exactly.
    if best_epoch >= 0 and os.path.isdir(bpath):
        btemplate = {
            "params": state_template.params,
            "bn_state": state_template.bn_state,
            "opt_state": state_template.opt_state,
        }
        b = _checkpointer().restore(bpath, item=btemplate)
        best = _replace_on_template(
            (b["params"], b["bn_state"], b["opt_state"]),
            (state_template.params, state_template.bn_state, state_template.opt_state),
        )
    return int(restored["epoch"]), new_state, extras, best
