"""Optional Weights & Biases logging.

The reference logs everything to wandb unconditionally (train_model.py:130,
266-268, 519-538). wandb is optional here: if the package is importable AND
logging is enabled (``--wandb`` / WANDB_ENABLED=1), calls pass through;
otherwise every call is a silent no-op, so pipelines run identically offline.
"""

from __future__ import annotations

import os


class _NoOpWandb:
    def __getattr__(self, name):
        return self

    def __call__(self, *args, **kwargs):
        return self


_enabled = False
_wandb = _NoOpWandb()


def enable() -> bool:
    """Turn real wandb on if available. Returns whether it is active."""
    global _enabled, _wandb
    try:
        import wandb as real_wandb

        _wandb = real_wandb
        _enabled = True
    except Exception:
        _enabled = False
    return _enabled


def get():
    """Current logger object (real wandb or the no-op)."""
    if not _enabled and os.environ.get("WANDB_ENABLED") == "1":
        enable()
    return _wandb


def is_enabled() -> bool:
    return _enabled
