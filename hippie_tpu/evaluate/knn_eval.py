"""On-device KNN classification (replaces sklearn KNeighborsClassifier glue in
train_model.py:415-461).

The reference sweeps k in 5..19 over three embedding types, refitting sklearn
each time on the host. Here the full sweep is one TPU pass: compute the
[n_test, n_train] squared-distance matrix on the MXU, take the top max(k)
neighbors once, then derive every k's majority vote from prefix one-hot
counts. Tie-breaking matches sklearn: equal votes go to the lowest class
index; equal distances resolve by train-index order.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """[n, d] x [m, d] -> [n, m] squared euclidean distances (MXU matmul)."""
    a2 = jnp.sum(jnp.square(a), axis=1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return a2 - 2.0 * ab + b2.T


@functools.partial(jax.jit, static_argnames=("max_k", "num_classes"))
def _knn_sweep(train_x, train_y, test_x, *, max_k: int, num_classes: int):
    d = pairwise_sq_dists(test_x, train_x)
    # top_k on negated distances; stable -> lowest index wins distance ties.
    _, nbr_idx = jax.lax.top_k(-d, max_k)  # [n_test, max_k]
    nbr_labels = train_y[nbr_idx]  # [n_test, max_k]
    onehot = jax.nn.one_hot(nbr_labels, num_classes, dtype=jnp.int32)
    counts = jnp.cumsum(onehot, axis=1)  # [n_test, max_k, C] votes using first k
    # argmax picks the lowest class index on vote ties, like scipy mode.
    preds = jnp.argmax(counts, axis=2)  # [n_test, max_k]
    return preds


def knn_predict_sweep(
    train_x: np.ndarray,
    train_y: np.ndarray,
    test_x: np.ndarray,
    ks: Sequence[int],
    num_classes: int | None = None,
    mesh=None,
):
    """Predictions for every k in ``ks`` in a single device pass.

    With ``mesh`` the query rows are sharded over the 'data' axis (train set
    replicated): each device scores its query shard against the full train
    set, so the [n_test, n_train] distance matrix never materializes on one
    chip. Returns {k: np.ndarray[n_test]}.
    """
    train_y = np.asarray(train_y, dtype=np.int32)
    if num_classes is None:
        num_classes = int(train_y.max()) + 1
    max_k = int(max(ks))
    from hippie_tpu.utils import aot

    n_test = test_x.shape[0]
    train_x = jnp.asarray(train_x, jnp.float32)
    train_y_dev = jnp.asarray(train_y)
    test_x = jnp.asarray(test_x, jnp.float32)
    if mesh is not None and mesh.size > 1:
        from hippie_tpu.data import device_data
        from hippie_tpu.parallel import mesh as pmesh

        # zero-row query pads; their preds are sliced off below
        test_x = device_data.pad_rows(test_x, n_test + (-n_test) % mesh.size)
        (train_x, train_y_dev), (test_x,) = pmesh.place_eval_inputs(
            mesh, (train_x, train_y_dev), (test_x,))

    statics = {"max_k": max_k, "num_classes": int(num_classes)}
    preds = aot.maybe_cached_call(
        _knn_sweep, (train_x, train_y_dev, test_x),
        f"knn_sweep|k={max_k}|C={int(num_classes)}", statics)
    preds = np.asarray(preds)[:n_test]
    return {k: preds[:, k - 1] for k in ks}
