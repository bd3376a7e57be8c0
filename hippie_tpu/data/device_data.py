"""Device-resident datasets and statically-shaped batch plans.

TPU-first replacement for the reference's DataLoader machinery
(hippie/dataloading.py + torch DataLoader): the whole preprocessed dataset
lives on device (all shipped datasets are <10 MB after preprocessing), and an
epoch is a ``lax.scan`` over a precomputed ``[num_batches, B]`` index array.
Variable dataset sizes are handled by padding the final batch and carrying a
per-sample validity mask, which the model's BatchNorm and the losses consume —
reproducing unpadded per-batch semantics exactly (tested in
tests/test_backbones.py::test_masked_batch_equals_small_batch).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ArrayDataset:
    """Preprocessed, device-ready arrays for one (or a concatenation of) dataset(s).

    wave:   [N, 50] float32
    isi:    [N, 100] float32
    source: [N] int32 source ids
    label:  [N] int32 class labels (or None)
    """

    wave: jnp.ndarray
    isi: jnp.ndarray
    source: jnp.ndarray
    label: Optional[jnp.ndarray] = None

    def __len__(self):
        return self.wave.shape[0]

    def take(self, idx) -> "ArrayDataset":
        idx = jnp.asarray(idx)
        return ArrayDataset(
            wave=self.wave[idx],
            isi=self.isi[idx],
            source=self.source[idx],
            label=None if self.label is None else self.label[idx],
        )

    @staticmethod
    def concat(datasets) -> "ArrayDataset":
        labels = [d.label for d in datasets]
        return ArrayDataset(
            wave=jnp.concatenate([d.wave for d in datasets]),
            isi=jnp.concatenate([d.isi for d in datasets]),
            source=jnp.concatenate([d.source for d in datasets]),
            label=None if any(l is None for l in labels) else jnp.concatenate(labels),
        )


def train_val_split(n: int, train_prop: float, key) -> Tuple[np.ndarray, np.ndarray]:
    """Random index split like torch random_split (train_model.py:106), with an
    explicit jax PRNG key instead of torch's global generator."""
    n_train = int(train_prop * n)
    perm = np.asarray(jax.random.permutation(key, n))
    return perm[:n_train], perm[n_train:]


def batch_plan(
    indices: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool,
    key=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build a statically-shaped epoch plan from an index stream.

    Returns (idx [nb, B] int32, mask [nb, B] float32). The final batch is
    padded with its own LAST REAL index and mask 0 (drop_last=False
    semantics). Duplicating an in-batch sample keeps padded rows bounded
    through every masked BatchNorm with zero in-step cost: the pads normalize
    exactly like the sample they copy, so even the degenerate 1-real-sample
    tail (batch variance 0, inv ~1/sqrt(eps)) maps them to the BN bias
    instead of amplifying them layer over layer
    (tests/test_masked_tail_robustness.py; zero-index pads blew up to inf).
    Stats and losses exclude pads either way — real-row math is unchanged.
    """
    indices = np.asarray(indices)
    if shuffle:
        assert key is not None
        order = np.asarray(jax.random.permutation(key, len(indices)))
        indices = indices[order]
    n = len(indices)
    nb = max(1, -(-n // batch_size))
    padded = np.zeros(nb * batch_size, dtype=np.int32)
    padded[:n] = indices
    if n:
        padded[n:] = indices[n - 1]
    mask = np.zeros(nb * batch_size, dtype=np.float32)
    mask[:n] = 1.0
    return padded.reshape(nb, batch_size), mask.reshape(nb, batch_size)


def next_pow2(n: int, minimum: int = 64) -> int:
    """Smallest power of two >= max(n, minimum) — the shape-bucketing unit."""
    b = minimum
    while b < n:
        b *= 2
    return b


def pad_rows(arr, n_bucket: int):
    """Pad axis 0 with zeros up to n_bucket (gather-source shape bucketing:
    batch plans only ever index real rows, so pad content is never read)."""
    n = arr.shape[0]
    if n >= n_bucket:
        return arr
    pad = [(0, n_bucket - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def pad_plan(idx, mask, nb_bucket: int):
    """Pad a [nb, B] batch plan to [nb_bucket, B] with zero-index, zero-mask
    batches; returns (idx, mask, n_real_batches). The bucketed epoch runners
    only execute the first n_real_batches."""
    import numpy as _np

    nb = idx.shape[0]
    if nb >= nb_bucket:
        return idx, mask, nb
    idx_p = _np.zeros((nb_bucket,) + idx.shape[1:], idx.dtype)
    idx_p[:nb] = idx
    mask_p = _np.zeros((nb_bucket,) + mask.shape[1:], mask.dtype)
    mask_p[:nb] = mask
    return idx_p, mask_p, nb


def epoch_shuffle_order(key, P: int, n_real):
    """Canonical bucketed epoch-shuffle order shared by the host fit loop and
    train/device_fit: a stable argsort of per-slot uniforms with pad slots
    (index >= n_real) pushed last. The first n_real output positions are a
    uniform random permutation of 0..n_real-1, while the program's shape
    depends only on the power-of-two bucket P — so one compiled fit program
    serves every real stream length in the bucket (n_real is a runtime
    scalar). Works traced (device_fit) and eagerly (host plans)."""
    u = jax.random.uniform(key, (P,))
    return jnp.argsort(jnp.where(jnp.arange(P) < n_real, u, jnp.inf))


def plan_pad_duplicate(flat, n_real):
    """Traced pad fill for a flat [nbB] index plan: slots >= n_real duplicate
    the last real index. An in-batch duplicate stays bounded through masked
    BN even in the degenerate 1-real-sample tail batch (see batch_plan).
    Used by train/device_fit's in-device epoch_plan; host_epoch_plan mirrors
    it bit-identically in numpy (tests/test_masked_tail_robustness.py)."""
    nbB = flat.shape[0]
    last_real = flat[jnp.maximum(n_real - 1, 0)]
    return jnp.where(jnp.arange(nbB) < n_real, flat, last_real)


def host_epoch_plan(stream, batch_size: int, shuffle: bool, key, limit=None):
    """Build one epoch's (idx [nb_pad, B], mask, n_batches) on the host,
    bit-identically to the plan device_fit generates in-device — the host
    fit loop (train/loop.py path) stays on the same
    trajectory as the default whole-fit-on-device path."""
    from hippie_tpu.train.loop import limit_count

    stream = np.asarray(stream, np.int32)
    n_real = int(stream.shape[0])
    P = next_pow2(n_real, minimum=1)
    sp = np.zeros((P,), np.int32)
    sp[:n_real] = stream
    if shuffle:
        sp = sp[np.asarray(epoch_shuffle_order(key, P, n_real))]
    nb_full = max(1, -(-n_real // batch_size))
    n_keep = limit_count(nb_full, limit)
    nb_pad = next_pow2(n_keep, minimum=1)
    nbB = nb_pad * batch_size
    flat = np.zeros((nbB,), np.int32)
    m = min(P, nbB)
    flat[:m] = sp[:m]
    if 0 < n_real < nbB:
        # numpy mirror of plan_pad_duplicate (n_real <= min(P, nbB) = m here,
        # so the last real slot is always flat[n_real - 1])
        flat[n_real:] = flat[n_real - 1]
    mask = (np.arange(nbB) < n_real).astype(np.float32)
    return flat.reshape(nb_pad, batch_size), mask.reshape(nb_pad, batch_size), n_keep
