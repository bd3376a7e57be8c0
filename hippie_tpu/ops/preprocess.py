"""Whole-dataset on-device preprocessing.

Replaces the reference's per-item host preprocessing
(hippie/dataloading.py:27-56, 74-101) with one vectorized XLA call over the
entire dataset:

  waveform:  [optional min-max to [-1, 1]]  ->  linear resample to 50
  isi:       log(x + 1)  ->  [optional z-score]  ->  linear resample to 100

Order (normalize before resample) and numerics (torch ``.std()`` is the
unbiased estimator) match the reference exactly. All shipped pipelines call
the datasets with ``normalize=False`` (e.g. scripts/train_model.py:92-93),
but both paths are supported and tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hippie_tpu.ops.resample import resample_linear

WAVE_LEN = 50
ISI_LEN = 100


def preprocess_waveforms(wf, *, normalize: bool = False, out_len: int = WAVE_LEN):
    """[N, W_raw] float -> [N, out_len]. Mirrors dataloading.py:75,81-93."""
    wf = jnp.asarray(wf, jnp.float32)
    if normalize:
        mn = jnp.min(wf, axis=1, keepdims=True)
        mx = jnp.max(wf, axis=1, keepdims=True)
        wf = (wf - mn) / (mx - mn)
        wf = wf * 2.0 - 1.0
    return resample_linear(wf, out_len)


def preprocess_isi(isi, *, normalize: bool = False, out_len: int = ISI_LEN):
    """[N, W_raw] float -> [N, out_len]. Mirrors dataloading.py:77-78,90,95-96."""
    isi = jnp.asarray(isi, jnp.float32)
    isi = jnp.log(isi + 1.0)
    if normalize:
        mean = jnp.mean(isi, axis=1, keepdims=True)
        # torch .std() is the unbiased (n-1) estimator.
        n = isi.shape[1]
        var = jnp.sum(jnp.square(isi - mean), axis=1, keepdims=True) / (n - 1)
        isi = (isi - mean) / jnp.sqrt(var)
    return resample_linear(isi, out_len)


@functools.partial(jax.jit, static_argnames=("normalize",))
def preprocess_pair(wf, isi, *, normalize: bool = False):
    """Preprocess both modalities in one compiled call."""
    return (
        preprocess_waveforms(wf, normalize=normalize),
        preprocess_isi(isi, normalize=normalize),
    )


@functools.partial(jax.jit, static_argnames=("normalize",))
def preprocess_pair_padded(wf, isi, R_wf, R_isi, wf_width, isi_width, *,
                           normalize: bool = False):
    """Width-agnostic preprocess_pair for serving.

    ``wf``/``isi`` are zero-padded on the width axis to fixed caps
    ([N, W_cap] / [N, I_cap]); the resample coefficients ride in as traced
    arguments (resample.padded_interp_matrix, zero rows beyond the true
    width) and ``wf_width``/``isi_width`` are traced int32 scalars. One
    compiled program therefore covers EVERY raw request width <= the caps —
    without this, the serving warmup ladder only pre-compiled its own raw
    widths and the first live request of any other width stalled ~80 s
    behind a fresh remote compile (measured, RESULTS.md round 4).

    Padded tail columns must be finite (the server pads with zeros); the
    zero coefficient rows remove them from every output, and normalize
    statistics are masked to the true widths. Agrees with the exact-width
    preprocess_pair to fp32 rounding (reduction-tree order differs;
    tests/test_preprocess.py pins the tolerance).
    """
    wf = jnp.asarray(wf, jnp.float32)
    isi = jnp.asarray(isi, jnp.float32)
    if normalize:
        wmask = jnp.arange(wf.shape[1])[None, :] < wf_width
        mn = jnp.min(jnp.where(wmask, wf, jnp.inf), axis=1, keepdims=True)
        mx = jnp.max(jnp.where(wmask, wf, -jnp.inf), axis=1, keepdims=True)
        wf = ((wf - mn) / (mx - mn)) * 2.0 - 1.0
    wave = jnp.matmul(wf, R_wf, preferred_element_type=jnp.float32)

    li = jnp.log(isi + 1.0)
    if normalize:
        imask = jnp.arange(li.shape[1])[None, :] < isi_width
        n = jnp.asarray(isi_width, jnp.float32)
        mean = jnp.sum(jnp.where(imask, li, 0.0), axis=1, keepdims=True) / n
        var = jnp.sum(jnp.where(imask, jnp.square(li - mean), 0.0),
                      axis=1, keepdims=True) / (n - 1.0)
        li = (li - mean) / jnp.sqrt(var)
    time = jnp.matmul(li, R_isi, preferred_element_type=jnp.float32)
    return wave, time
