"""utils/aot: on-disk AOT program cache — cross-process round-trip safety.

Regression for a live poisoning: jax's serialize_executable does NOT
round-trip across processes on XLA:CPU when the program spans fewer devices
than the platform exposes — the deserialized executable loads as a portable
executable onto EVERY local device and then demands one arg shard per device
("Expected args to execute_sharded_on_local_devices to have 8 shards, got:
[1, ...]"). The writer process always runs fine (it executes its own
freshly-compiled object), so a green suite could still poison the cache for
every LATER process. Under the 8-virtual-device conftest platform,
single-device programs must therefore take the StableHLO path, and any
disk-loaded executable must be validated against the call's device span.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.utils import aot


@pytest.fixture()
def fresh_memo():
    saved = dict(aot._EXEC_MEMO)
    aot._EXEC_MEMO.clear()
    yield
    aot._EXEC_MEMO.clear()
    aot._EXEC_MEMO.update(saved)


def test_single_device_program_avoids_exec_serialization(tmp_path, fresh_memo):
    """On the multi-device CPU platform a single-device program must be
    cached as .shlo (placement-free), never .jexec (broken round-trip)."""
    if jax.default_backend() != "cpu" or jax.local_device_count() < 2:
        pytest.skip("needs the multi-device CPU conftest platform")
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.arange(8, dtype=jnp.float32)
    assert not aot._exec_roundtrip_safe((x,))
    d = str(tmp_path / "aot")
    out = aot.cached_call(f, (x,), d, "aottest|single")
    np.testing.assert_array_equal(np.asarray(out), np.arange(8) * 2 + 1)
    names = os.listdir(d)
    assert names and all(n.endswith(".shlo") for n in names), names

    # a later process (memo cleared) reads the entry back and agrees
    aot._EXEC_MEMO.clear()
    out2 = aot.cached_call(f, (x,), d, "aottest|single")
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
    assert sorted(os.listdir(d)) == sorted(names)  # reused, not rewritten


def test_full_span_program_keeps_exec_serialization(tmp_path, fresh_memo):
    """A program sharded over ALL local devices round-trips correctly and
    keeps the fast executable format."""
    if jax.default_backend() != "cpu" or jax.local_device_count() < 2:
        pytest.skip("needs the multi-device CPU conftest platform")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    n = jax.local_device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(n), ("d",))
    sh = NamedSharding(mesh, PartitionSpec("d"))
    x = jax.device_put(jnp.arange(4 * n, dtype=jnp.float32), sh)
    assert aot._exec_roundtrip_safe((x,))
    f = jax.jit(lambda v: v + 1)
    d = str(tmp_path / "aot")
    out = aot.cached_call(f, (x,), d, "aottest|span")
    np.testing.assert_array_equal(np.asarray(out), np.arange(4 * n) + 1)
    names = os.listdir(d)
    assert names and all(n_.endswith(".jexec") for n_ in names), names

    aot._EXEC_MEMO.clear()
    out2 = aot.cached_call(f, (x,), d, "aottest|span")
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_foreign_topology_entry_recompiled(tmp_path, fresh_memo):
    """A disk entry whose executable footprint mismatches the call's device
    span (written under another topology) is detected and recompiled, not
    executed."""
    if jax.default_backend() != "cpu" or jax.local_device_count() < 2:
        pytest.skip("needs the multi-device CPU conftest platform")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    n = jax.local_device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(n), ("d",))
    sh = NamedSharding(mesh, PartitionSpec("d"))
    x = jax.device_put(jnp.arange(4 * n, dtype=jnp.float32), sh)
    f = jax.jit(lambda v: v + 1)
    d = str(tmp_path / "aot")
    out = aot.cached_call(f, (x,), d, "aottest|foreign")
    (name,) = os.listdir(d)

    # corrupt the entry into a "foreign topology" one by splicing in a
    # single-device program's payload under the same key
    g = jax.jit(lambda v: v - 1)
    y = jnp.arange(4 * n, dtype=jnp.float32)  # single-device arg
    from jax.experimental.serialize_executable import serialize

    comp = g.lower(y).compile()
    with open(os.path.join(d, name), "wb") as fh:
        pickle.dump(serialize(comp), fh)

    aot._EXEC_MEMO.clear()
    out2 = aot.cached_call(f, (x,), d, "aottest|foreign")
    # recompiled the real program rather than running the foreign entry
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
