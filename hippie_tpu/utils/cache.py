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
    import jax

    if jax.default_backend() == "cpu":
        # Segregate CPU-backend caches per host ISA, the same keying
        # utils/aot.py applies to .jexec entries: XLA:CPU AOT cache entries
        # embed machine-specific codegen (AVX-512 etc.), and a container
        # migration onto different hardware would load foreign entries that
        # warn ("Machine type used for XLA:CPU compilation doesn't match…")
        # and can SIGILL at run time. TPU entries are device code — the
        # shared dir stays flat there.
        from hippie_tpu.utils.aot import _host_fingerprint

        path = os.path.join(path, f"isa-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)

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
