"""Persistent XLA compile cache helper.

Cold compiles dominate wall-clock for one-shot CLI runs (remote TPU compiles
take tens of seconds per distinct module; the single-core CPU here takes
minutes). Every entry point enables a persistent on-disk cache so repeated
invocations pay compile costs once.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hippie_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache EVERY compile, including sub-second tiny-op modules: on the
        # remote-TPU (axon) backend each compile is a ~0.5-2 s service round
        # trip regardless of module size, and a warm pipeline run otherwise
        # re-pays ~100 tiny compiles (~60-100 s measured, round 3).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
