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


def save_fit_state(directory: str, epoch: int, state, extras: dict):
    """Persist TrainState + loop bookkeeping for ``resume_fit_state``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    payload = {
        "epoch": np.asarray(epoch),
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "extras": {k: np.asarray(v) for k, v in extras.items()},
    }
    path = os.path.join(directory, f"epoch_{epoch:06d}")
    _checkpointer().save(path, payload, force=True)
    # keep only the latest two epochs
    entries = sorted(e for e in os.listdir(directory) if e.startswith("epoch_"))
    for stale in entries[:-2]:
        import shutil

        shutil.rmtree(os.path.join(directory, stale), ignore_errors=True)


def latest_fit_state(directory: str) -> Optional[str]:
    # orbax/tensorstore refuses relative paths on restore (save abspaths
    # above); the CLI default checkpoint dir is the relative "checkpoints".
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    entries = sorted(e for e in os.listdir(directory) if e.startswith("epoch_"))
    return os.path.join(directory, entries[-1]) if entries else None


def resume_fit_state(directory: str, state_template) -> Optional[Tuple[int, Any, dict]]:
    """Restore (epoch, TrainState, extras) from the latest saved epoch."""
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
    import orbax.checkpoint as ocp

    restored = _checkpointer().restore(path, item=template)
    new_state = type(state_template)(
        restored["params"], restored["bn_state"], restored["opt_state"]
    )
    # Re-place every leaf on the TEMPLATE's sharding: under --dp-devices /
    # --fsdp the live TrainState is replicated / per-leaf sharded over the
    # mesh, and the fit programs require their inputs on that mesh — orbax
    # restores to default single-device placement, which would otherwise mix
    # devices in one jit call. Pure placement: the resumed trajectory is
    # unchanged.
    import jax

    new_state = jax.tree_util.tree_map(
        lambda x, t: jax.device_put(x, t.sharding) if hasattr(t, "sharding") else x,
        new_state,
        state_template,
    )
    extras = restored.get("extras") or {}
    return int(restored["epoch"]), new_state, extras
