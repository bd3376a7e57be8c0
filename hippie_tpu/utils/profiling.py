"""Profiling and timing hooks (reference has none — SURVEY.md §5).

``trace(dir)`` wraps a block in a jax.profiler trace (viewable in
TensorBoard / Perfetto); ``StageTimer`` records wall-clock per pipeline stage
and can dump a JSON summary.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class StageTimer:
    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (time.perf_counter() - t0)

    def summary(self) -> str:
        total = sum(self.timings.values())
        return json.dumps({**{k: round(v, 3) for k, v in self.timings.items()},
                           "total_s": round(total, 3)})

    def dump(self, path: str):
        with open(path, "w") as f:
            f.write(self.summary() + "\n")
