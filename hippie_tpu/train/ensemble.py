"""Vmapped K-replica training: train K same-shape models in ONE program.

A TPU-native capability the reference cannot express: seed ensembles and
learning-rate sweeps train every replica in ONE compiled program by
``jax.vmap``-ing the fused train step over a leading replica axis.

Measured honestly (scripts/ensemble_experiment.py, RESULTS.md): per-STEP
cost is ~K x a single model (K=2 buys +5%, K=4 parity, K=8 regresses on
memory pressure) — each replica carries its own conv weights, so XLA lowers
the vmapped convs as per-replica convs rather than one larger-batch matmul.
The wall-clock win is everything around the step: K replicas share one
program (one trace/compile, one dispatch+RTT stream per epoch, one setup)
instead of K full runs — and on the remote-TPU deployments this repo
targets, per-run dispatch/setup is the measured bottleneck, not step
compute (RESULTS.md round-3 sections).

Design notes:

- Replicas share the data, the epoch plan (same shuffle), and the batch
  masks; they differ in init params and in the per-step reparameterization
  noise (per-replica PRNG streams). For a pure seed ensemble that is the
  standard recipe. Parity: replica k's forward/loss is bit-equivalent to a
  single-model run seeded with the same init and the k-th per-replica key
  stream; full trajectories are equivalent-not-bit-equal, because vmap
  changes fp32 reduction order in the backward and first-step Adam turns
  noise-level gradients (conv biases feeding BN — mathematically zero) into
  O(lr) sign flips (tests/test_ensemble.py).
- Per-replica LEARNING RATES ride the existing inject_hyperparams design
  (train/optim.py:81-84): lr is optimizer *state*, so a vmapped opt_state
  simply carries a [K] lr vector — one compiled program sweeps K learning
  rates at once (``set_ensemble_lr``).
- Dict key order inside vmap/jit is key-sorted like everywhere else; to
  export a replica as a Lightning ckpt, reorder with
  ``checkpoint.reorder_like`` against an ``eval_shape`` template exactly as
  the pipeline does (CLAUDE.md invariants).

Reference counterpart: none — the reference trains one model per process
(train_model.py:135-158); this module is pure rebuild surplus.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.models import cvae
from hippie_tpu.train.step import TrainState, make_unimodal_steps


def n_replicas(ts: TrainState) -> int:
    return jax.tree_util.tree_leaves(ts.params)[0].shape[0]


def take_replica(tree, k: int):
    """Extract replica k's leaves (host-side indexing; one slice per leaf)."""
    return jax.tree_util.tree_map(lambda x: x[k], tree)


def stack_trees(trees):
    """Stack a list of same-structure pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def init_unimodal_ensemble(key, cfg: cvae.CVAEConfig, tx, n: int) -> TrainState:
    """K independently-initialized replicas + vmapped optimizer state.

    Init math per replica is identical to ``unimodal_cvae_init`` with the
    K split keys — a replica equals a single-model init with that key.
    """
    keys = jax.random.split(key, n)
    params, bn = jax.vmap(lambda k: cvae.unimodal_cvae_init(k, cfg))(keys)
    opt_state = jax.vmap(tx.init)(params)
    return TrainState(params, bn, opt_state)


def set_ensemble_lr(opt_state, lrs):
    """Give each replica its own learning rate (lr sweep in one program).

    Works because make_optimizer routes lr through inject_hyperparams: the
    vmapped InjectHyperparamsState already stores a [K] lr vector; this
    replaces it with ``lrs``.
    """
    lrs = jnp.asarray(lrs, jnp.float32)
    found = [False]

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            hp = dict(node.hyperparams)
            if lrs.shape != jnp.shape(hp["learning_rate"]):
                raise ValueError(
                    f"lrs shape {lrs.shape} != ensemble lr state shape "
                    f"{jnp.shape(hp['learning_rate'])}"
                )
            hp["learning_rate"] = lrs
            found[0] = True
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(visit(c) for c in node)
        return node

    new_state = visit(opt_state)
    if not found[0]:
        # Identity comparison can't detect this (visit() rebuilds every plain
        # tuple), so track replacement explicitly.
        raise ValueError("no inject_hyperparams lr state found in opt_state")
    return new_state


def make_unimodal_ensemble_epoch_fns(
    tx,
    *,
    beta: float = 1.0,
    use_class_labels: bool = False,
    loss_backend: str = "xla",
    block_backend: str = "xla",
):
    """(train_epoch, eval_epoch) over a stacked K-replica TrainState.

    train_epoch(ts, data, source, class_, idx, mask, rng) -> (ts, Metrics[nb, K])
    eval_epoch(params, bn, data, source, class_, idx, mask, rng) -> Metrics[nb, K]

    Same data/plan contract as step.make_unimodal_epoch_fns; the per-replica
    key streams derive as split(rng, K) then split(r_k, nb) — replica k's
    trajectory tracks a single-model train_epoch called with
    rng = split(rng, K)[k] on the same plan (see module docstring re parity).
    """
    batch_step, eval_step = make_unimodal_steps(
        tx, beta=beta, loss_backend=loss_backend, block_backend=block_backend,
    )
    v_train = jax.vmap(batch_step, in_axes=(0, None, None, None, None, 0))
    v_eval = jax.vmap(eval_step, in_axes=(0, 0, None, None, None, None, 0))

    def _step_keys(rng, nb, k):
        rkeys = jax.random.split(rng, k)
        keys = jax.vmap(lambda r: jax.random.split(r, nb))(rkeys)  # [K, nb, 2]
        return jnp.swapaxes(keys, 0, 1)  # [nb, K, 2]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(ts: TrainState, data, source, class_, idx, mask, rng):
        keys = _step_keys(rng, idx.shape[0], n_replicas(ts))
        bd_all = data[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        def body(carry, xs):
            bd, bs, bc, bmask, brngs = xs
            return v_train(carry, bd, bs, bc if use_class_labels else None, bmask, brngs)

        ts, ms = jax.lax.scan(body, ts, (bd_all, bs_all, bc_all, mask, keys))
        return ts, ms

    @jax.jit
    def eval_epoch(params, bn_state, data, source, class_, idx, mask, rng):
        k = jax.tree_util.tree_leaves(params)[0].shape[0]
        keys = _step_keys(rng, idx.shape[0], k)
        bd_all = data[idx]
        bs_all = source[idx]
        bc_all = class_[idx] if use_class_labels else idx

        def body(carry, xs):
            bd, bs, bc, bmask, brngs = xs
            m = v_eval(params, bn_state, bd, bs,
                       bc if use_class_labels else None, bmask, brngs)
            return carry, m

        _, ms = jax.lax.scan(body, None, (bd_all, bs_all, bc_all, mask, keys))
        return ms

    return train_epoch, eval_epoch


@dataclass
class EnsembleFitResult:
    state: TrainState                 # final stacked state
    best_params: Any                  # stacked per-replica best snapshots
    best_bn_state: Any
    best_val_loss: np.ndarray         # [K]
    best_epoch: np.ndarray            # [K] int
    epochs_run: int
    train_losses: List[np.ndarray] = field(default_factory=list)  # per epoch [K]
    val_losses: List[np.ndarray] = field(default_factory=list)


def fit_ensemble(
    ts: TrainState,
    *,
    run_train_epoch: Callable[[TrainState, Any, int], tuple],
    run_val_epoch: Callable[[TrainState, Any, int], Any],
    max_epochs: int,
    early_stopping_patience: Optional[int] = None,
    seed: int = 42,
    verbose: bool = False,
) -> EnsembleFitResult:
    """Per-replica best tracking + joint early stopping for an ensemble.

    Mirrors loop.fit's epoch/RNG scheme (fold_in(fold_in(root, 2e), 1|2)) so
    replica trajectories line up with single-model fits. Each replica tracks
    its OWN best epoch; the loop stops once EVERY replica has gone
    ``patience`` epochs without improving (per-replica trajectories keep
    evolving; snapshots are frozen per replica on-device via jnp.where, one
    scalar fetch per epoch).

    Best snapshots route through optim.eval_params_jit, so a schedule-free
    optimizer snapshots the averaged x iterate (identity for plain AdamW) —
    the same contract as pipeline.run_val. A schedule-free run_val_epoch
    callback must itself evaluate at the x iterate (pass eval-params through
    in the callback, as pipeline.run_val does).
    """
    from hippie_tpu.train import optim as optim_mod

    root = jax.random.PRNGKey(seed)
    k = n_replicas(ts)
    best_val = np.full((k,), np.inf)
    best_epoch = np.full((k,), -1, np.int64)
    wait = np.zeros((k,), np.int64)
    # Never alias ts's buffers: the train epoch donates its input state, so
    # the best snapshot must always come out of the jitted where() select
    # (fresh buffers). Initialized lazily from the first post-epoch state.
    best_params, best_bn = None, None
    train_losses, val_losses = [], []

    @jax.jit
    def select_best(improved, best, cur):
        def sel(b, c):
            shape = (k,) + (1,) * (c.ndim - 1)
            return jnp.where(improved.reshape(shape), c, b)

        return jax.tree_util.tree_map(sel, best, cur)

    epochs_run = 0
    for epoch in range(max_epochs):
        tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
        vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)
        ts, tms = run_train_epoch(ts, tkey, epoch)
        vms = run_val_epoch(ts, vkey, epoch)
        tms_h, vms_h = jax.device_get((tms, vms))
        tl = np.mean(np.asarray(tms_h.loss, np.float64), axis=0)  # [K]
        vl = np.mean(np.asarray(vms_h.loss, np.float64), axis=0)
        if not np.all(np.isfinite(tl)):
            raise FloatingPointError(
                f"non-finite ensemble training loss at epoch {epoch}: {tl}"
            )
        train_losses.append(tl)
        val_losses.append(vl)
        improved = vl < best_val
        if improved.any() or best_params is None:
            imp = jnp.asarray(improved)
            eval_p = optim_mod.eval_params_jit(ts.opt_state, ts.params)
            base_p = eval_p if best_params is None else best_params
            base_bn = ts.bn_state if best_bn is None else best_bn
            best_params = select_best(imp, base_p, eval_p)
            best_bn = select_best(imp, base_bn, ts.bn_state)
        best_epoch = np.where(improved, epoch, best_epoch)
        best_val = np.minimum(best_val, vl)
        wait = np.where(improved, 0, wait + 1)
        epochs_run = epoch + 1
        if verbose:
            print(f"ensemble epoch {epoch}: val={np.array2string(vl, precision=4)}")
        if early_stopping_patience is not None and np.all(wait >= early_stopping_patience):
            break

    return EnsembleFitResult(
        state=ts,
        best_params=best_params,
        best_bn_state=best_bn,
        best_val_loss=best_val,
        best_epoch=best_epoch,
        epochs_run=epochs_run,
        train_losses=train_losses,
        val_losses=val_losses,
    )
