"""ctypes wrapper for the native CSV reader (native/fastcsv.c).

Compiles the shared object on demand (cached next to the source, rebuilt when
the .c file changes) and exposes ``read_numeric_csv(path)`` returning a
float32 [rows, cols] array with pandas-compatible semantics for the numeric
dataset files (header skipped, index column retained — quirk Q4, empty fields
NaN). Falls back to pandas transparently if no C compiler is available;
``available()`` reports which path is active.

Parity with ``pd.read_csv(...).to_numpy(np.float32)`` on every shipped
dataset file is enforced by tests/test_fastcsv.py. Measured ~15-40x faster
than pandas on this container for the shipped files.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "fastcsv.c"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _so_path() -> pathlib.Path:
    # Keyed on a content hash of the source (never committed, gitignored):
    # a stale or foreign binary can't shadow the reviewed .c file the way an
    # mtime check could.
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    return _REPO / "native" / f"_fastcsv-{digest}.so"


class _CsvResult(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("rows", ctypes.c_long),
        ("cols", ctypes.c_long),
        ("err", ctypes.c_int),
    ]


def _build(so: pathlib.Path) -> bool:
    if so.exists():
        return True
    tmp = so.with_suffix(f".tmp{os.getpid()}")
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
                capture_output=True,
                timeout=120,
            )
            if r.returncode == 0:
                os.replace(tmp, so)  # atomic: concurrent builders race safely
                return True
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    tmp.unlink(missing_ok=True)
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("HIPPIE_NO_FASTCSV") == "1":
            return None
        try:
            if not _SRC.exists():
                return None
            so = _so_path()
            if not _build(so):
                return None
            lib = ctypes.CDLL(str(so))
            lib.fastcsv_read.restype = ctypes.POINTER(_CsvResult)
            lib.fastcsv_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.fastcsv_free.restype = None
            lib.fastcsv_free.argtypes = [ctypes.POINTER(_CsvResult)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def read_numeric_csv(path: str, *, skip_header: bool = True) -> np.ndarray:
    """float32 [rows, cols]; native parser with pandas fallback."""
    lib = _load()
    if lib is not None:
        res_ptr = lib.fastcsv_read(str(path).encode(), 1 if skip_header else 0)
        if res_ptr:
            res = res_ptr.contents
            try:
                # err 2 (short rows, NaN-padded) matches pandas; err 4 (long
                # rows) falls through to pandas, which raises ParserError —
                # silently truncating extra fields would train on bad data.
                if res.err in (0, 2) and res.rows > 0:
                    n = res.rows * res.cols
                    arr = np.ctypeslib.as_array(res.data, shape=(n,)).astype(
                        np.float32, copy=True
                    )
                    return arr.reshape(res.rows, res.cols)
                if res.err == 0 and res.rows == 0:
                    return np.zeros((0, 0), np.float32)
            finally:
                lib.fastcsv_free(res_ptr)
    import pandas as pd

    return pd.read_csv(
        path, header=0 if skip_header else None
    ).to_numpy(dtype=np.float32)
