"""Linear resampling as a precomputed interpolation-matrix matmul.

The reference resamples every sample individually on the host with
``F.interpolate(x, size=(out,), mode="linear")`` (align_corners=False;
hippie/dataloading.py:45,49,93,96). On TPU we precompute, once per raw input
width, the sparse interpolation matrix R[in_len, out_len] with the exact
align_corners=False coefficients, and resample whole datasets as a single
MXU matmul ``X @ R``. This is bit-equivalent in exact arithmetic and agrees
with torch to float32 rounding (verified in tests/test_resample.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def interp_matrix(in_len: int, out_len: int, dtype=np.float32) -> np.ndarray:
    """R[in_len, out_len] s.t. x @ R == F.interpolate(x, out_len, mode='linear').

    align_corners=False source coordinate: src = (i + 0.5) * (in/out) - 0.5,
    clamped to [0, in-1]; output = (1-frac)*x[floor] + frac*x[floor+1].
    """
    # torch computes source coordinates in float32 on the CPU path; match it
    # so coefficients agree to the last bit.
    scale = np.float32(in_len) / np.float32(out_len)
    i = np.arange(out_len, dtype=np.float32)
    src = (i + np.float32(0.5)) * scale - np.float32(0.5)
    src = np.clip(src, np.float32(0.0), np.float32(in_len - 1))
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = (src - lo).astype(np.float32)
    R = np.zeros((in_len, out_len), dtype=np.float32)
    cols = np.arange(out_len, dtype=np.int64)
    np.add.at(R, (lo, cols), np.float32(1.0) - frac)
    np.add.at(R, (hi, cols), frac)
    return R.astype(dtype)


@functools.lru_cache(maxsize=None)
def padded_interp_matrix(in_len: int, out_len: int, cap: int,
                         dtype=np.float32) -> np.ndarray:
    """interp_matrix(in_len, out_len) zero-padded to [cap, out_len] rows.

    Lets one compiled program resample ANY raw width <= cap: the input rows
    are zero-padded to cap columns and the width-specific coefficients ride
    in as a traced argument, so XLA sees one fixed [N, cap] @ [cap, out_len]
    matmul per row bucket instead of one program per raw width (the serving
    path's first-request compile stall)."""
    if in_len > cap:
        raise ValueError(f"in_len {in_len} exceeds padded width cap {cap}")
    R = np.zeros((cap, out_len), dtype=dtype)
    R[:in_len] = interp_matrix(in_len, out_len, dtype)
    return R


def resample_linear(x, out_len: int):
    """Resample [..., L] -> [..., out_len] with torch-linear coefficients."""
    in_len = x.shape[-1]
    R = jnp.asarray(interp_matrix(in_len, out_len))
    return jnp.matmul(x, R, preferred_element_type=x.dtype)
