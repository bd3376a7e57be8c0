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
