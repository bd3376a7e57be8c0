"""Test configuration: force JAX onto a virtual 8-device CPU platform.

The container routes JAX to a remote TPU chip via the experimental 'axon'
platform (pinned by a sitecustomize hook that overrides JAX_PLATFORMS). Tests
must run locally and exercise multi-device sharding, so we select the CPU
backend in-process before any backend is initialized and force 8 host devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the container has ONE CPU core and XLA compiles of
# the fused train epochs take minutes; cache across test runs. The dir is
# keyed by host-ISA fingerprint (same rule as utils/aot.py .jexec entries and
# utils/cache.py): XLA:CPU AOT entries embed machine codegen, and a container
# migration used to make every test run load foreign entries with SIGILL-risk
# cpu_aot_loader warnings.
from hippie_tpu.utils.aot import _host_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache/isa-{_host_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "tests" / "goldens"
REFERENCE = pathlib.Path("/root/reference")


def _ensure_goldens():
    """Generate torch-reference goldens on first run (not committed: ~180 MB)."""
    marker = GOLDEN_DIR / "multimodal_cvae.npz"
    if marker.exists():
        return True
    if not REFERENCE.exists():
        return False
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, str(REPO / "tests" / "golden_gen.py")],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        print("golden generation failed:", r.stdout[-2000:], r.stderr[-2000:])
    return marker.exists()


@pytest.fixture(scope="session")
def goldens_dir():
    if not _ensure_goldens():
        pytest.skip("goldens unavailable (no reference checkout and none generated)")
    return GOLDEN_DIR
