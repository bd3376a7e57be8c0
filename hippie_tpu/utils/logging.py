"""Structured metrics logging (reference: wandb-only + bare prints, SURVEY §5).

``JsonlLogger`` appends one JSON object per event to a file and can fan out to
additional sinks (e.g. the wandb shim). Used as the pipeline's ``log_fn``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, also: Optional[List[Callable[[dict], None]]] = None):
        self.path = path
        self.also = also or []
        if path:
            parent = os.path.dirname(os.path.abspath(path))
            os.makedirs(parent, exist_ok=True)
        self._fh = open(path, "a") if path else None

    def __call__(self, event: dict):
        record = {"ts": round(time.time(), 3), **event}
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        for sink in self.also:
            sink(event)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
