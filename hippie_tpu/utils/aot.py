"""Generic on-disk AOT program cache for jitted callables.

On single-core hosts driving a remote-compile TPU backend, a fresh process
pays trace + lower (seconds per program on this host) and a compile-service
round trip for EVERY jitted program before any device work happens. This
module serializes the COMPILED executable (jax.experimental.
serialize_executable) keyed by arg shapes/dtypes/shardings + a static
config description + jax version + backend + a hash of the hippie_tpu
sources, so later processes skip trace, lowering AND backend compile
(~0.2 s deserialize per program vs 4-20 s).

Used by train/device_fit.py for whole-stage fit programs and by
evaluate/{embeddings,knn_eval}.py for the eval programs (the pipeline sets
the process-wide default directory from --aot-dir).

The populating run compiles through the normal jit path (``fn.lower(*args)
.compile()``), so it costs the same as a plain run and its backend compile
lands in the persistent HLO cache as usual. Entries are topology-specific;
a load failure (different machine/mesh) falls back to a fresh compile that
overwrites the entry. When executable serialization is unavailable the
jax.export StableHLO format is used instead (re-lowered calling
convention; slower to populate, still skips per-process tracing).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

_REGISTERED_NT: set = set()


def register_io_namedtuples(tree) -> None:
    """Register every namedtuple type in a pytree for jax.export
    serialization (names are module.qualname — stable across processes)."""
    from jax import export as jexport

    def register(t, name):
        try:
            from jax._src.export._export import serialization_registry
            prior = serialization_registry.get(t)
        except Exception:  # registry is private API; fall back to blind try
            prior = None
        if prior is not None:
            # Already registered. If under a DIFFERENT serialized name, cache
            # files written by this process would be undeserializable by
            # readers using the canonical name — fail loudly instead of
            # producing silently-incompatible entries.
            if prior[0] != name:
                raise RuntimeError(
                    f"namedtuple {t} already registered for jax.export "
                    f"serialization as {prior[0]!r}; the AOT program cache "
                    f"requires the canonical name {name!r}"
                )
            return
        jexport.register_namedtuple_serialization(t, serialized_name=name)

    def visit(obj):
        t = type(obj)
        if hasattr(t, "_fields"):
            if t not in _REGISTERED_NT:
                _REGISTERED_NT.add(t)
                register(t, f"{t.__module__}.{t.__qualname__}")
            for f in obj._fields:
                visit(getattr(obj, f))
        elif isinstance(obj, (tuple, list)):
            for c in obj:
                visit(c)
        elif isinstance(obj, dict):
            for c in obj.values():
                visit(c)

    visit(tree)


_SOURCE_REV: Optional[str] = None


def source_revision() -> str:
    """Hash of the hippie_tpu package sources. Folded into AOT cache keys so
    editing model/step/loss code invalidates stale compiled programs (same
    shapes + same jax version would otherwise silently replay old code)."""
    global _SOURCE_REV
    if _SOURCE_REV is None:
        import hashlib

        import hippie_tpu

        h = hashlib.sha256()
        pkg_root = os.path.dirname(os.path.abspath(hippie_tpu.__file__))
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, pkg_root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SOURCE_REV = h.hexdigest()[:16]
    return _SOURCE_REV


_HOST_FP: Optional[str] = None


def _host_fingerprint() -> str:
    """ISA fingerprint of THIS host. Folded into CPU-backend cache keys:
    XLA:CPU executables embed machine-specific codegen (AVX-512 etc.), and a
    .jexec written on one container deserializes cleanly on another but can
    SIGILL at run time (cpu_aot_loader warns about exactly this). TPU
    executables are device code — host ISA is irrelevant there."""
    global _HOST_FP
    if _HOST_FP is None:
        import hashlib
        import platform

        flags = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        flags = " ".join(sorted(line.split(":", 1)[1].split()))
                        break
        except OSError:
            pass
        _HOST_FP = hashlib.sha256(
            f"{platform.machine()}|{flags}".encode()).hexdigest()[:12]
    return _HOST_FP


def cache_key(args: tuple, static_desc: str) -> str:
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = "|".join(
        f"{tuple(l.shape)}:{l.dtype}:{getattr(l, 'sharding', None)}" for l in leaves
    )
    backend = jax.default_backend()
    host = _host_fingerprint() if backend == "cpu" else ""
    raw = (f"{jax.__version__}|{backend}|{host}|{source_revision()}|"
           f"{static_desc}|{treedef}|{sig}")
    return hashlib.sha256(raw.encode()).hexdigest()[:24]


def have_exec_serialization() -> bool:
    try:
        from jax.experimental import serialize_executable  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def _args_device_span(args) -> int:
    """Widest device footprint across the call's array args (1 for a
    single-device program, the mesh size for a sharded one)."""
    span = 1
    for leaf in jax.tree_util.tree_leaves(args):
        sh = getattr(leaf, "sharding", None)
        if sh is not None:
            try:
                span = max(span, len(sh.device_set))
            except Exception:
                pass
    return span


def _exec_roundtrip_safe(args) -> bool:
    """False where serialize_executable is known NOT to round-trip across
    processes: XLA:CPU loads a deserialized executable as a PORTABLE
    executable onto EVERY local device, so a program compiled for fewer
    devices than the platform exposes (a single-device program under
    --xla_force_host_platform_device_count=8, say) demands one arg shard
    per local device at execute time ("Expected args to
    execute_sharded_on_local_devices to have 8 shards, got: [1, ...]").
    Reproduced minimally with jit(x+1): the writer process runs fine,
    every later process fails at execute. A program spanning ALL local
    devices (the dp fit programs) round-trips correctly. For the broken
    combination the StableHLO fallback is used instead — placement-free,
    and its re-compile lands in the persistent XLA compile cache, so later
    processes still skip the expensive backend compile."""
    if jax.default_backend() != "cpu" or jax.local_device_count() == 1:
        return True
    return _args_device_span(args) == jax.local_device_count()


def _loaded_matches_args(loaded, args) -> bool:
    """Sanity-check a DISK-loaded executable against the current call: its
    device footprint must match the args'. A mismatch means the entry was
    written under a different topology (or hit the portable-load quirk
    above) and would fail — or worse, misplace — at execute time; treat it
    as stale. Probes private jax structure, so any probe failure counts as
    a match (fall back to trusting the key)."""
    try:
        n_exec = len(loaded._executable.xla_executable.local_devices())
    except Exception:
        return True
    return n_exec == _args_device_span(args)


_EXEC_MEMO: dict = {}  # path -> loaded compiled callable (per process)

_UNWRITABLE_WARNED: set = set()  # aot dirs already reported unusable

_PRUNED_DIRS: set = set()


def _prune_stale(aot_dir: str, rev: str) -> None:
    """Entry filenames carry the source revision (prog_<rev>_<key>); every
    code edit orphans the previous revision's multi-MB executables, so drop
    them (plus leftover .tmp files from crashed writers) once per process.
    A concurrently-running older-revision process whose entry disappears
    just falls back to a fresh compile."""
    if aot_dir in _PRUNED_DIRS:
        return
    _PRUNED_DIRS.add(aot_dir)
    prefix = f"prog_{rev}_"
    try:
        names = os.listdir(aot_dir)
    except OSError:
        return
    import time

    for fn in names:
        p = os.path.join(aot_dir, fn)
        stale_rev = fn.startswith("prog_") and not fn.startswith(prefix)
        stale_tmp = False
        if ".tmp." in fn:  # only reap tmps old enough to be from dead writers
            try:
                stale_tmp = time.time() - os.path.getmtime(p) > 3600
            except OSError:
                continue
        if stale_rev or stale_tmp:
            try:
                os.unlink(p)
            except OSError:
                pass

# Process-wide default cache directory (pipeline sets it from --aot-dir);
# opt-in consumers (eval programs) use it via maybe_cached_call.
_DEFAULT_DIR: Optional[str] = None


def set_default_dir(path: Optional[str]) -> None:
    global _DEFAULT_DIR
    _DEFAULT_DIR = path


def default_dir() -> Optional[str]:
    return _DEFAULT_DIR


def cached_call(fn, args: tuple, aot_dir: str, static_desc: str,
                lower_kwargs: Optional[dict] = None) -> Any:
    """Run ``fn(*args, **lower_kwargs)`` through the on-disk AOT cache.

    ``fn`` must be a jitted callable; ``lower_kwargs`` carries its static
    keyword arguments (also fold them into ``static_desc`` — they are not
    hashed from the values).
    """
    lower_kwargs = lower_kwargs or {}
    try:
        os.makedirs(aot_dir, exist_ok=True)
    except OSError as e:
        # The cache is a pure performance lever: an unwritable/full cache
        # dir (read-only HOME with the default --aot-dir) must degrade to an
        # uncached run, not abort a multi-hour pipeline.
        if aot_dir not in _UNWRITABLE_WARNED:
            _UNWRITABLE_WARNED.add(aot_dir)
            import warnings

            warnings.warn(f"AOT cache dir {aot_dir} is unusable ({e}); "
                          "running uncached")
        return fn(*args, **lower_kwargs)
    rev = source_revision()[:10]
    _prune_stale(aot_dir, rev)
    key = cache_key(args, static_desc)

    if have_exec_serialization() and _exec_roundtrip_safe(args):
        import pickle

        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        path = os.path.join(aot_dir, f"prog_{rev}_{key}.jexec")

        def compile_and_store():
            compiled = fn.lower(*args, **lower_kwargs).compile()
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "wb") as f:
                    pickle.dump(serialize(compiled), f)
                os.replace(tmp, path)
            except Exception:
                # backend can't serialize executables: still run compiled
                if os.path.exists(tmp):
                    os.unlink(tmp)
            _EXEC_MEMO[path] = compiled
            return compiled

        loaded = _EXEC_MEMO.get(path)
        from_disk = False
        if loaded is None and os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                loaded = deserialize_and_load(payload, in_tree, out_tree)
                if not _loaded_matches_args(loaded, args):
                    loaded = None  # foreign topology: recompile + overwrite
                else:
                    from_disk = True
            except Exception:
                loaded = None  # stale/corrupt/foreign-topology: recompile
        if loaded is None:
            return compile_and_store()(*args)
        _EXEC_MEMO[path] = loaded
        if not from_disk:
            return loaded(*args)
        try:
            return loaded(*args)
        except Exception:
            # The entry deserialized and passed the footprint probe yet still
            # refused the args (foreign shardings under a colliding key, or a
            # placement quirk the probe can't see). First use after a disk
            # load only: recompile, overwrite, rerun — a failure here would
            # otherwise wedge every later process on this machine. Recovery
            # is only sound while the args are intact: if the failed execute
            # got far enough to consume donated buffers (donate_argnums
            # programs), re-lowering on deleted Arrays would raise a
            # misleading secondary error — surface the original instead.
            if any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(args)
            ):
                # Still evict the bad entry from disk AND the memo before
                # re-raising: leaving it would wedge every later process (and
                # any same-process retry, which takes the no-recovery memo
                # branch above) on the exact failure this path exists to heal.
                _EXEC_MEMO.pop(path, None)
                try:
                    os.unlink(path)
                except OSError:
                    pass
                raise
            return compile_and_store()(*args)

    # ---- fallback: jax.export StableHLO artifact --------------------------
    # The exported-artifact path does not carry multi-device shardings (the
    # reason device_fit pre-guards its dp programs). Eval programs with
    # mesh-sharded inputs (embed_*/knn_predict_sweep with mesh=) reach here
    # through maybe_cached_call, so guard centrally: run uncached rather
    # than exporting a program that would lose its placement.
    if any(
        hasattr(leaf, "sharding") and len(getattr(leaf.sharding, "device_set", ())) > 1
        for leaf in jax.tree_util.tree_leaves(args)
    ):
        return fn(*args, **lower_kwargs)

    from jax import export as jexport

    register_io_namedtuples(args)
    path = os.path.join(aot_dir, f"prog_{rev}_{key}.shlo")
    exported = _EXEC_MEMO.get(path)
    if exported is None and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exported = jexport.deserialize(f.read())
        except Exception:
            exported = None  # stale/corrupt entry: fall through to re-export
    if exported is None:
        exported = jexport.export(fn)(*args, **lower_kwargs)
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                f.write(exported.serialize())
            os.replace(tmp, path)
        except OSError:
            # full/unwritable disk: still run the exported program this call
            if os.path.exists(tmp):
                os.unlink(tmp)
    _EXEC_MEMO[path] = exported
    return exported.call(*args)


def maybe_cached_call(fn, args: tuple, static_desc: str,
                      lower_kwargs: Optional[dict] = None) -> Any:
    """cached_call through the process default dir, or a plain call when no
    default dir is configured (library use outside the pipeline)."""
    if _DEFAULT_DIR is None:
        return fn(*args, **(lower_kwargs or {}))
    return cached_call(fn, args, _DEFAULT_DIR, static_desc, lower_kwargs)
