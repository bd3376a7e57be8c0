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
    padded with index 0 and mask 0 (drop_last=False semantics).
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
    mask = np.zeros(nb * batch_size, dtype=np.float32)
    mask[:n] = 1.0
    return padded.reshape(nb, batch_size), mask.reshape(nb, batch_size)
