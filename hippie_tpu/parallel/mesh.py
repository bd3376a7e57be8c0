"""Multi-chip execution via jax.sharding.Mesh + GSPMD.

The reference is strictly single-device (SURVEY.md §2.4) — its only
"distribution" is CPU DataLoader workers. The TPU-native scaling story is
data parallelism over the ICI mesh: parameters and the (small, device-
resident) dataset are replicated; the per-batch index plan is sharded along
the batch axis, so each chip gathers and processes its shard of every batch
and XLA inserts the gradient all-reduce (psum over 'data') automatically.

At reference scale (8M-param model, <20k-sample datasets) this is the whole
story — there is no attention, no long sequence axis, and the model fits in a
fraction of one chip's HBM, so tensor/pipeline sharding would only add
collective latency. The helpers below are nonetheless written against an
arbitrary mesh so larger configs can shard the channel axes ('model') too.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over the first n devices (default: all), 1-D 'data' by default."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        # factorize devices across the requested axes: put everything on axis 0
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, *, batch_axis: int = 1, ndim: int = 2) -> NamedSharding:
    """Shard the batch axis of a [nb, B] (or [B, ...]) array over 'data'."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def fsdp_sharding_for(mesh: Mesh, leaf, axis: str = "data") -> NamedSharding:
    """ZeRO/FSDP-style sharding spec for one parameter leaf.

    Shards the largest axis whose size divides the mesh axis; leaves that
    cannot be split evenly (tiny biases, 5-wide embeddings) stay replicated.
    GSPMD then all-gathers shards on use and keeps optimizer state sharded.
    """
    n = mesh.shape[axis]
    shape = getattr(leaf, "shape", ())
    if not shape:
        return replicated(mesh)
    candidates = [(size, i) for i, size in enumerate(shape) if size % n == 0 and size >= n]
    if not candidates:
        return replicated(mesh)
    _, dim = max(candidates)
    spec = [None] * len(shape)
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_params_fsdp(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree with per-leaf FSDP shardings (see fsdp_sharding_for)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding_for(mesh, x, axis)), tree
    )


def place_eval_inputs(mesh: Optional[Mesh], trees: Tuple, row_arrays: Tuple):
    """Replicate model trees and shard row arrays over 'data' for eval.

    Eval is embarrassingly data-parallel (per-row forward with running BN
    stats, or per-query KNN scoring), so batch-sharding the rows scales every
    extraction across the mesh with no collectives until the final gather.
    If the row count does not divide the mesh (callers bucket to powers of
    two, or zero-pad queries to the mesh size), inputs are left unplaced —
    single-device semantics. Shared by evaluate/embeddings.py and
    evaluate/knn_eval.py.
    """
    if mesh is None or mesh.size <= 1 or row_arrays[0].shape[0] % mesh.size != 0:
        return trees, row_arrays
    repl = replicated(mesh)
    trees = tuple(jax.device_put(t, repl) for t in trees)
    row_arrays = tuple(
        jax.device_put(a, batch_sharded(mesh, batch_axis=0, ndim=a.ndim))
        for a in row_arrays
    )
    return trees, row_arrays


def shard_epoch_inputs(mesh: Mesh, ts, data_arrays: Tuple, idx, mask):
    """Place TrainState + dataset replicated; shard the epoch plan on 'data'.

    Under jit, GSPMD propagates the [nb, B@data] plan sharding through the
    batch gather, giving each chip B/n_devices samples per step; parameter
    gradients come back replicated via an automatic psum.
    """
    repl = replicated(mesh)
    ts = jax.device_put(ts, repl)
    data_arrays = tuple(jax.device_put(a, repl) for a in data_arrays)
    idx = jax.device_put(idx, batch_sharded(mesh, batch_axis=1, ndim=2))
    mask = jax.device_put(mask, batch_sharded(mesh, batch_axis=1, ndim=2))
    return ts, data_arrays, idx, mask
