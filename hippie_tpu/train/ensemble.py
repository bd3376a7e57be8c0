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
from typing import Any, Callable, List, Optional, Tuple

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


def init_multimodal_ensemble(key, cfg: cvae.MultiModalConfig, tx, n: int) -> TrainState:
    """K independently-initialized joint-model replicas (multimodal twin of
    ``init_unimodal_ensemble``); replica k equals ``multimodal_cvae_init``
    with split key k."""
    keys = jax.random.split(key, n)
    params, bn = jax.vmap(lambda k: cvae.multimodal_cvae_init(k, cfg))(keys)
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


def _step_keys(rng, nb, k):
    """Per-(batch, replica) key grid, [nb, K, 2].

    SHARED by the host epoch fns and the device whole-fit program: their
    trajectory parity (tests/test_ensemble.py) rests on both deriving the
    exact same key stream, so there must be exactly one copy of this
    derivation. split(rng, n) is prefix-stable in n, which is what lets the
    device loop's nb_pad-sized split agree with the host's real-batch split.
    """
    rkeys = jax.random.split(rng, k)
    keys = jax.vmap(lambda r: jax.random.split(r, nb))(rkeys)  # [K, nb, 2]
    return jnp.swapaxes(keys, 0, 1)  # [nb, K, 2]


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
        # where(), not minimum(): a transient non-finite val epoch (a high-lr
        # replica passing through an inf/nan loss it later recovers from) must
        # not poison the best tracker — nan fails the `<` test above, whereas
        # np.minimum would propagate it forever. Matches the device loop's
        # jnp.where select (observed live: a TPU lr=0.01 replica hit one nan
        # val epoch, recovered to 0.013, and minimum() had frozen its best).
        best_val = np.where(improved, vl, best_val)
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


# ---------------------------------------------------------------------------
# Whole-ensemble-fit-as-one-XLA-call (the device_fit design over a replica
# axis): every epoch of every replica, the per-replica best tracking and the
# joint early-stopping decision run inside ONE jitted lax.while_loop — one
# dispatch and one small fetch for the entire K-config sweep, instead of the
# host loop's 2 dispatches + 1 device_get PER EPOCH (~65 ms each on the
# remote axon backend; a K=4 x 40-epoch sweep pays ~120 round trips the
# device loop collapses to one). Same rationale as train/device_fit.py:6-13,
# applied to the ensemble capability.
# ---------------------------------------------------------------------------


def _build_ensemble_fit(batch_step, eval_step, *, n_rep: int, shuffle: bool,
                        batch_size: int, nb_pad: int, use_class_labels: bool,
                        eval_params_fn=None, n_arrays: int = 1):
    """The jitted whole-ensemble-fit program.

    ``batch_step``/``eval_step`` are the UNVMAPPED single-model steps from
    step.make_unimodal_steps; the replica vmap happens here. Trajectory
    contract: replica k follows the host fit_ensemble loop driven with the
    canonical bucketed plan (data.device_data.host_epoch_plan) — identical
    epoch plans (epoch_shuffle_order), identical per-replica key streams
    (_step_keys; jax.random.split(key, n) is prefix-stable in n, so the
    nb_pad-sized device split agrees with the host's real-batch-count split
    on every executed batch).
    """
    from hippie_tpu.data.device_data import epoch_shuffle_order, plan_pad_duplicate

    # One in_axes entry per data array (multimodal steps take (b1, b2, ...)):
    # replica axis on state/key only, batch operands broadcast across replicas.
    v_train = jax.vmap(batch_step,
                       in_axes=(0,) + (None,) * (n_arrays + 3) + (0,))
    v_eval = jax.vmap(eval_step,
                      in_axes=(0, 0) + (None,) * (n_arrays + 3) + (0,))
    nbB = nb_pad * batch_size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit(carry, arrays, source, class_, stream_p, n_real, t_nb,
            v_idx, v_mask, v_nb, root, epoch_budget, patience):
        P = stream_p.shape[0]
        nb_val = v_idx.shape[0]
        t_mask = (jnp.arange(nbB) < n_real).astype(jnp.float32).reshape(nb_pad, batch_size)

        # Validation inputs are epoch-invariant: gather once, outside the loop.
        v_arrays = tuple(a[v_idx] for a in arrays)
        v_src = source[v_idx]
        v_cls = class_[v_idx] if use_class_labels else None

        def epoch_plan(pkey):
            s = stream_p
            if shuffle:
                s = stream_p[epoch_shuffle_order(pkey, P, n_real)]
            m = min(P, nbB)  # static
            flat = jnp.zeros((nbB,), jnp.int32).at[:m].set(s[:m])
            flat = plan_pad_duplicate(flat, n_real)
            return flat.reshape(nb_pad, batch_size)

        zeros_k = jnp.zeros((n_rep,), jnp.float32)

        def cond(c):
            epoch, stop = c[0], c[-1]
            return (epoch < epoch_budget) & (~stop)

        def body(c):
            (epoch, ts, best_val, best_epoch, wait, diverged,
             best_params, best_bn, buf, _stop) = c
            tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
            vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)

            # ---- train epoch: all K replicas per batch -----------------------
            idx = epoch_plan(jax.random.fold_in(tkey, 0))
            b_arrays = tuple(a[idx] for a in arrays)
            bs_all = source[idx]
            bc_all = class_[idx] if use_class_labels else None
            keys = _step_keys(jax.random.fold_in(tkey, 1), nb_pad, n_rep)

            def tb(i, carry):
                t, acc = carry
                new_t, m = v_train(
                    t, *(g[i] for g in b_arrays), bs_all[i],
                    bc_all[i] if use_class_labels else None, t_mask[i], keys[i],
                )
                return new_t, acc + m.loss

            ts, tsum = jax.lax.fori_loop(0, t_nb, tb, (ts, zeros_k))
            train_loss = tsum / jnp.maximum(t_nb.astype(jnp.float32), 1.0)

            # ---- val epoch ---------------------------------------------------
            vkeys = _step_keys(vkey, nb_val, n_rep)
            # schedule-free evaluates/snapshots at the averaged x iterate
            # (identity for plain AdamW) — same contract as fit_ensemble.
            vparams = eval_params_fn(ts) if eval_params_fn is not None else ts.params

            def vb(i, acc):
                m = v_eval(
                    vparams, ts.bn_state, *(g[i] for g in v_arrays), v_src[i],
                    v_cls[i] if use_class_labels else None, v_mask[i], vkeys[i],
                )
                return acc + m.loss

            vsum = jax.lax.fori_loop(0, v_nb, vb, zeros_k)
            val_loss = vsum / jnp.maximum(v_nb.astype(jnp.float32), 1.0)

            # ---- per-replica best + joint early stop (fit_ensemble parity) --
            improved = val_loss < best_val  # [K]

            def sel(new, old):
                def pick(n, o):
                    shape = (n_rep,) + (1,) * (n.ndim - 1)
                    return jnp.where(improved.reshape(shape), n, o)

                return jax.tree_util.tree_map(pick, new, old)

            best_params = sel(vparams, best_params)
            best_bn = sel(ts.bn_state, best_bn)
            best_val = jnp.where(improved, val_loss, best_val)
            best_epoch = jnp.where(improved, epoch, best_epoch)
            wait = jnp.where(improved, 0, wait + 1)

            # fit_ensemble raises when ANY replica's train loss is non-finite.
            bad = ~jnp.all(jnp.isfinite(train_loss))
            stop = bad | jnp.all(wait >= patience)
            buf = buf.at[epoch].set(jnp.stack([train_loss, val_loss]))
            return (epoch + 1, ts, best_val, best_epoch, wait, diverged | bad,
                    best_params, best_bn, buf, stop)

        return jax.lax.while_loop(cond, body, carry)

    return fit


@functools.partial(jax.jit, static_argnums=(2,))
def _init_ensemble_carry(ts, buf, k, epoch=0, best_val=None, best_epoch=None,
                         wait=None, best2=None):
    # Best seeds must be COPIES of the live state: the whole carry is donated
    # to the fit program (donating aliased buffers is an execution error).
    # ``best2``: a restored (best_params, best_bn) from --resume — fresh orbax
    # buffers, never aliased to ts, so they seed the best slots directly. The
    # loop counters are runtime values so fresh starts and resume restarts
    # share one compiled program.
    best_p, best_bn = (best2 if best2 is not None else
                       jax.tree_util.tree_map(jnp.copy, (ts.params, ts.bn_state)))
    bv = (jnp.full((k,), jnp.inf, jnp.float32) if best_val is None
          else jnp.asarray(best_val, jnp.float32))
    be = (jnp.full((k,), -1, jnp.int32) if best_epoch is None
          else jnp.asarray(best_epoch, jnp.int32))
    w = (jnp.zeros((k,), jnp.int32) if wait is None
         else jnp.asarray(wait, jnp.int32))
    return (
        jnp.asarray(epoch, jnp.int32), ts, bv, be, w,
        jnp.bool_(False), best_p, best_bn, buf, jnp.bool_(False),
    )


def device_fit_ensemble(
    ts: TrainState,
    *,
    batch_step,
    eval_step,
    arrays: Tuple[jnp.ndarray, ...],
    source: jnp.ndarray,
    class_: Optional[jnp.ndarray],
    train_stream: np.ndarray,
    batch_size: int,
    val_idx: jnp.ndarray,
    val_mask: jnp.ndarray,
    val_nb,
    max_epochs: int,
    early_stopping_patience: Optional[int] = None,
    seed: int = 42,
    use_class_labels: bool = False,
    shuffle: bool = True,
    eval_params_fn=None,
    aot_dir: Optional[str] = None,
    aot_desc: str = "",
    progress_every: Optional[int] = None,
    verbose: bool = False,
    log_fn=None,
    resume_dir: Optional[str] = None,
) -> EnsembleFitResult:
    """Run a whole K-replica ensemble fit on device; one dispatch total.

    Shape bucketing matches train.device_fit: the index stream pads to a
    power of two, real counts travel as runtime scalars, and the epoch
    budget is runtime — sweeps over datasets/epoch budgets in the same
    bucket share ONE compiled program (and the on-disk AOT cache via
    ``aot_dir``). ``progress_every`` runs the same program in epoch chunks
    for live progress (identical trajectory: per-epoch RNG derives from
    (seed, epoch)).

    ``resume_dir``: orbax mid-run resume for sweeps/ensembles (the 200-760 s
    K-replica lr sweeps used to restart from zero on any interruption).
    Forces chunked execution (cadence = progress_every, default every epoch)
    and persists the stacked TrainState, the [K] best/wait counters AND the
    stacked per-replica best snapshots after each chunk
    (orbax_io.save_ensemble_fit_state — one atomic payload). Per-epoch RNG
    derives from (seed, epoch), so a resumed EnsembleFitResult is bit-equal
    to the uninterrupted run regardless of where each replica's best fell
    (tests/test_ensemble.py resume cases).

    Trajectory parity with the host ``fit_ensemble`` (driven on
    host_epoch_plan plans) is pinned by tests/test_ensemble.py.
    """
    from hippie_tpu.data import device_data
    from hippie_tpu.utils import aot as _aot

    k = n_replicas(ts)
    n_real = int(len(train_stream))
    nb_full = max(1, -(-n_real // batch_size))
    nb_pad = device_data.next_pow2(nb_full, minimum=1)
    P = device_data.next_pow2(n_real, minimum=1)
    stream_p = np.zeros((P,), np.int32)
    stream_p[:n_real] = np.asarray(train_stream, np.int32)

    if max_epochs <= 0:
        return EnsembleFitResult(
            state=ts, best_params=ts.params, best_bn_state=ts.bn_state,
            best_val_loss=np.full((k,), np.inf),
            best_epoch=np.full((k,), -1, np.int64), epochs_run=0,
        )

    start_epoch, bv0, be0, w0, best0 = 0, None, None, None, None
    if resume_dir is not None:
        from hippie_tpu.train import orbax_io

        resumed = orbax_io.resume_ensemble_fit_state(resume_dir, ts)
        if resumed is not None:
            last_epoch, ts, extras, best0 = resumed
            start_epoch = last_epoch + 1
            bv0 = np.asarray(extras["best_val"], np.float32)
            be0 = np.asarray(extras["best_epoch"], np.int32)
            w0 = np.asarray(extras["wait"], np.int32)
            if verbose:
                print(f"Resumed ensemble from {resume_dir} at epoch {start_epoch}")

    if (start_epoch > 0 and early_stopping_patience is not None
            and np.all(w0 >= early_stopping_patience)):
        # Joint early stopping already fired before the interruption; any
        # further epoch would diverge from the uninterrupted trajectory.
        if verbose:
            print(f"Ensemble early stopping already triggered at epoch "
                  f"{start_epoch - 1}; nothing to resume")
        return EnsembleFitResult(
            state=ts, best_params=best0[0], best_bn_state=best0[1],
            best_val_loss=np.asarray(bv0, np.float64),
            best_epoch=np.asarray(be0, np.int64), epochs_run=start_epoch,
        )

    fit = _build_ensemble_fit(
        batch_step, eval_step, n_rep=k, shuffle=shuffle,
        batch_size=batch_size, nb_pad=nb_pad,
        use_class_labels=use_class_labels, eval_params_fn=eval_params_fn,
        n_arrays=len(arrays),
    )
    e_pad = device_data.next_pow2(max_epochs, minimum=8)
    buf = jnp.full((e_pad, 2, k), jnp.nan, jnp.float32)
    patience = (early_stopping_patience if early_stopping_patience is not None
                else 2**31 - 2)
    mid_args = (
        tuple(arrays), source,
        class_ if class_ is not None else jnp.zeros_like(source),
        jnp.asarray(stream_p), jnp.asarray(n_real, jnp.int32),
        jnp.asarray(nb_full, jnp.int32), val_idx, val_mask,
        jnp.asarray(val_nb, jnp.int32), jax.random.PRNGKey(seed),
    )
    patience_arr = jnp.asarray(patience, jnp.int32)
    static_desc = (f"ens|{aot_desc}|K={k}|ucl={use_class_labels}|sh={shuffle}|"
                   f"B={batch_size}|nb={nb_pad}")

    def run_chunk(carry, epoch_budget: int):
        args = (carry, *mid_args, jnp.asarray(epoch_budget, jnp.int32), patience_arr)
        if aot_dir is not None:
            return _aot.cached_call(fit, args, aot_dir, static_desc)
        return fit(*args)

    def emit(rows, start):
        for off, row in enumerate(rows):
            e = start + off
            if verbose:
                print(f"ensemble epoch {e}: "
                      f"val={np.array2string(row[1], precision=4)}")
            if log_fn is not None:
                log_fn({"epoch": e,
                        "train_loss": [float(x) for x in row[0]],
                        "val_loss": [float(x) for x in row[1]]})

    carry = _init_ensemble_carry(ts, buf, k, start_epoch, bv0, be0, w0, best0)
    emitted = start_epoch
    chunk = int(progress_every) if (progress_every and progress_every > 0) else None
    if resume_dir is not None and chunk is None:
        chunk = 1  # per-epoch durability, matching device_fit's resume cadence
    if chunk is not None:
        budget = start_epoch
        last_saved = start_epoch - 1
        while True:
            budget = min(budget + chunk, max_epochs)
            carry = run_chunk(carry, budget)
            epochs_done, stop, diverged_now = (
                int(x) for x in jax.device_get((carry[0], carry[-1], carry[5])))
            if epochs_done > emitted:
                rows_new = np.asarray(jax.device_get(carry[8][emitted:epochs_done]))
                n_emit = len(rows_new) - 1 if diverged_now else len(rows_new)
                emit(rows_new[:n_emit], emitted)
                emitted = epochs_done - (1 if bool(diverged_now) else 0)
            if (resume_dir is not None and not diverged_now
                    and epochs_done - 1 > last_saved):
                # The diverged epoch is never persisted (device_fit parity);
                # the early-stopping epoch is. Best snapshots ride in the
                # SAME payload — see orbax_io.save_ensemble_fit_state.
                from hippie_tpu.train import orbax_io

                bv, be, wt = jax.device_get((carry[2], carry[3], carry[4]))
                orbax_io.save_ensemble_fit_state(
                    resume_dir, epochs_done - 1, carry[1],
                    {"best_val": bv, "best_epoch": be, "wait": wt},
                    (carry[6], carry[7]),
                )
                last_saved = epochs_done - 1
            if stop or diverged_now or epochs_done >= max_epochs:
                break
    else:
        carry = run_chunk(carry, max_epochs)

    (_e, final_ts, _bv, _be, _w, _d, best_params, best_bn, buf_d, _s) = carry
    (epochs_run, best_val, best_epoch, diverged), buf_h = jax.device_get(
        ((carry[0], carry[2], carry[3], carry[5]), buf_d)
    )
    epochs_run = int(epochs_run)
    rows = buf_h[:epochs_run]

    n_replay = epochs_run - 1 if bool(diverged) else epochs_run
    if emitted < n_replay:
        emit(rows[emitted:n_replay], emitted)

    if bool(diverged):
        bad = epochs_run - 1
        raise FloatingPointError(
            f"non-finite ensemble training loss at epoch {bad}: {rows[bad][0]}"
        )

    return EnsembleFitResult(
        state=final_ts,
        best_params=best_params,
        best_bn_state=best_bn,
        best_val_loss=np.asarray(best_val, np.float64),
        best_epoch=np.asarray(best_epoch, np.int64),
        epochs_run=epochs_run,
        # After a resume the loss lists cover only the epochs THIS call ran
        # (pre-resume rows were never computed here) — device_fit contract.
        train_losses=[np.asarray(r[0], np.float64) for r in rows[start_epoch:]],
        val_losses=[np.asarray(r[1], np.float64) for r in rows[start_epoch:]],
    )


# ---------------------------------------------------------------------------
# Replica-parallel fits over PER-REPLICA data streams: K same-shape fits that
# differ in their (fixed) batch plans — the k-fold refit shape (VERDICT_r4 #7:
# the honest `kfold --refit` used to run 10 folds x 2 modalities as 20
# sequential device_fit dispatches at ~7.7 s each, almost all of it per-run
# dispatch/setup RTT on the remote backend; folds are same-shape programs
# differing only in index streams, so they collapse into ONE dispatch here).
# Unlike _build_ensemble_fit (shared plan, per-replica init/lr), every replica
# here carries its own [nb, B] index plan + mask; plans are FIXED across
# epochs (the refit protocol trains with shuffle_train=False), so batches are
# gathered once outside the epoch loop.
#
# Per-replica early stopping: the sequential protocol stops each fold at its
# own patience exhaustion and takes the LAST-epoch state for stage-2
# embeddings (pipeline stage-2 contract). A joint while_loop cannot stop
# per-replica, so each replica's state is FROZEN (jnp.where snapshot) at the
# epoch its wait counter first reaches patience while the others train on;
# `EnsembleFitResult.state` holds those frozen states (last state for
# replicas that never stopped). Trajectory parity with the sequential fits is
# equivalence-not-bit-equality: vmap changes backward reduction order, and
# the per-replica key streams derive from split(root, K) rather than K
# independent stage seeds (module docstring).
# ---------------------------------------------------------------------------


def _build_replica_plan_fit(batch_step, eval_step, *, n_rep: int,
                            use_class_labels: bool, eval_params_fn=None,
                            n_arrays: int = 1):
    """The jitted K-replica fixed-plan fit program (see block comment)."""
    v_train = jax.vmap(
        batch_step,
        in_axes=(0,) + (0,) * n_arrays + (0, 0 if use_class_labels else None, 0, 0))
    v_eval = jax.vmap(
        eval_step,
        in_axes=(0, 0) + (0,) * n_arrays + (0, 0 if use_class_labels else None, 0, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit(carry, arrays, source, class_, t_idx, t_mask, v_idx, v_mask,
            root, epoch_budget, patience):
        nb = t_idx.shape[1]
        nb_val = v_idx.shape[1]
        # Plans are epoch-invariant: gather every batch once, outside the loop.
        b_arrays = tuple(a[t_idx] for a in arrays)      # [K, nb, B, ...]
        bs_all = source[t_idx]
        bc_all = class_[t_idx] if use_class_labels else None
        v_arrays = tuple(a[v_idx] for a in arrays)
        v_src = source[v_idx]
        v_cls = class_[v_idx] if use_class_labels else None
        zeros_k = jnp.zeros((n_rep,), jnp.float32)

        def sel_where(cond_k, new, old):
            def pick(n, o):
                shape = (n_rep,) + (1,) * (n.ndim - 1)
                return jnp.where(cond_k.reshape(shape), n, o)

            return jax.tree_util.tree_map(pick, new, old)

        def cond(c):
            epoch, stop = c[0], c[-1]
            return (epoch < epoch_budget) & (~stop)

        def body(c):
            (epoch, ts, best_val, best_epoch, wait, diverged, best_params,
             best_bn, fin_params, fin_bn, stopped, buf, _stop) = c
            tkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 1)
            vkey = jax.random.fold_in(jax.random.fold_in(root, 2 * epoch), 2)
            # fold_in(tkey, 1), not tkey: the same derivation as
            # _build_ensemble_fit (whose fold_in(tkey, 0) feeds the epoch
            # shuffle) — so when every replica's fixed plan coincides with
            # the shared-plan loop's shuffle=False plan, the two programs are
            # on the SAME trajectory (tests/test_ensemble.py pins this).
            keys = _step_keys(jax.random.fold_in(tkey, 1), nb, n_rep)

            def tb(i, carry):
                t, acc = carry
                new_t, m = v_train(
                    t, *(g[:, i] for g in b_arrays), bs_all[:, i],
                    bc_all[:, i] if use_class_labels else None,
                    t_mask[:, i], keys[i],
                )
                return new_t, acc + m.loss

            ts, tsum = jax.lax.fori_loop(0, nb, tb, (ts, zeros_k))
            train_loss = tsum / float(nb)

            vkeys = _step_keys(vkey, nb_val, n_rep)
            vparams = eval_params_fn(ts) if eval_params_fn is not None else ts.params

            def vb(i, acc):
                m = v_eval(
                    vparams, ts.bn_state, *(g[:, i] for g in v_arrays),
                    v_src[:, i], v_cls[:, i] if use_class_labels else None,
                    v_mask[:, i], vkeys[i],
                )
                return acc + m.loss

            vsum = jax.lax.fori_loop(0, nb_val, vb, zeros_k)
            val_loss = vsum / float(nb_val)

            improved = val_loss < best_val
            best_params = sel_where(improved, vparams, best_params)
            best_bn = sel_where(improved, ts.bn_state, best_bn)
            best_val = jnp.where(improved, val_loss, best_val)
            best_epoch = jnp.where(improved, epoch, best_epoch)
            wait = jnp.where(improved, 0, wait + 1)

            # Per-replica stop: freeze this replica's state the first time its
            # wait counter reaches patience (= the sequential fit's last
            # epoch); it keeps training harmlessly until every replica stops.
            newly = (~stopped) & (wait >= patience)
            fin_params = sel_where(newly, ts.params, fin_params)
            fin_bn = sel_where(newly, ts.bn_state, fin_bn)
            stopped = stopped | newly

            bad = ~jnp.all(jnp.isfinite(train_loss))
            stop = bad | jnp.all(stopped)
            buf = buf.at[epoch].set(jnp.stack([train_loss, val_loss]))
            return (epoch + 1, ts, best_val, best_epoch, wait, diverged | bad,
                    best_params, best_bn, fin_params, fin_bn, stopped, buf, stop)

        c = jax.lax.while_loop(cond, body, carry)
        (epoch, ts, best_val, best_epoch, wait, diverged, best_params,
         best_bn, fin_params, fin_bn, stopped, buf, stop) = c
        # Replicas that ran out of epoch budget before their patience fired
        # finish at the last state, like a sequential fit hitting max_epochs.
        fin_params = sel_where(stopped, fin_params, ts.params)
        fin_bn = sel_where(stopped, fin_bn, ts.bn_state)
        return (epoch, ts, best_val, best_epoch, wait, diverged, best_params,
                best_bn, fin_params, fin_bn, stopped, buf, stop)

    return fit


@functools.partial(jax.jit, static_argnums=(2,))
def _init_replica_plan_carry(ts, buf, k):
    # Donated carry: best/frozen seeds must be fresh copies, never aliases of
    # the live state (same rule as _init_ensemble_carry).
    cp = lambda: jax.tree_util.tree_map(jnp.copy, (ts.params, ts.bn_state))
    best_p, best_bn = cp()
    fin_p, fin_bn = cp()
    return (
        jnp.asarray(0, jnp.int32), ts,
        jnp.full((k,), jnp.inf, jnp.float32),
        jnp.full((k,), -1, jnp.int32),
        jnp.zeros((k,), jnp.int32),
        jnp.bool_(False), best_p, best_bn, fin_p, fin_bn,
        jnp.zeros((k,), jnp.bool_), buf, jnp.bool_(False),
    )


def device_fit_replica_plans(
    ts: TrainState,
    *,
    batch_step,
    eval_step,
    arrays: Tuple[jnp.ndarray, ...],
    source: jnp.ndarray,
    class_: Optional[jnp.ndarray],
    train_idx: np.ndarray,
    train_mask: np.ndarray,
    val_idx: np.ndarray,
    val_mask: np.ndarray,
    max_epochs: int,
    early_stopping_patience: Optional[int] = None,
    seed: int = 42,
    use_class_labels: bool = False,
    eval_params_fn=None,
    aot_dir: Optional[str] = None,
    aot_desc: str = "",
) -> EnsembleFitResult:
    """K same-model fits over per-replica FIXED batch plans, one dispatch.

    ``train_idx``/``train_mask`` are [K, nb, B] (``val_*`` likewise): replica
    k trains on its own index plan — the k-fold refit shape. Every batch of
    every plan must keep >= 1 real row (the duplicate-last-real invariant;
    fully-masked batches would NaN through masked BN), which the kfold caller
    guarantees by construction (equal-length fold streams).

    Returns an EnsembleFitResult whose ``state`` holds each replica's state
    at ITS OWN early-stop epoch (frozen in-loop; see block comment above) —
    the stage-2 "last-epoch model" contract — while ``best_*`` hold the usual
    per-replica best-val snapshots. ``state.opt_state`` is the loop-final
    optimizer state (not per-replica frozen); no caller consumes it.
    """
    from hippie_tpu.utils import aot as _aot

    k = n_replicas(ts)
    assert train_idx.shape[0] == k and val_idx.shape[0] == k, (
        f"plans carry {train_idx.shape[0]}/{val_idx.shape[0]} replicas, "
        f"state carries {k}")
    if max_epochs <= 0:
        return EnsembleFitResult(
            state=ts, best_params=ts.params, best_bn_state=ts.bn_state,
            best_val_loss=np.full((k,), np.inf),
            best_epoch=np.full((k,), -1, np.int64), epochs_run=0,
        )

    fit = _build_replica_plan_fit(
        batch_step, eval_step, n_rep=k, use_class_labels=use_class_labels,
        eval_params_fn=eval_params_fn, n_arrays=len(arrays),
    )
    from hippie_tpu.data import device_data

    e_pad = device_data.next_pow2(max_epochs, minimum=8)
    buf = jnp.full((e_pad, 2, k), jnp.nan, jnp.float32)
    patience = (early_stopping_patience if early_stopping_patience is not None
                else 2**31 - 2)
    carry = _init_replica_plan_carry(ts, buf, k)
    args = (
        carry, tuple(arrays), source,
        class_ if class_ is not None else jnp.zeros_like(source),
        jnp.asarray(train_idx, jnp.int32), jnp.asarray(train_mask, jnp.float32),
        jnp.asarray(val_idx, jnp.int32), jnp.asarray(val_mask, jnp.float32),
        jax.random.PRNGKey(seed), jnp.asarray(max_epochs, jnp.int32),
        jnp.asarray(patience, jnp.int32),
    )
    desc = (f"rplan|{aot_desc}|K={k}|ucl={use_class_labels}|"
            f"nb={train_idx.shape[1]}x{train_idx.shape[2]}|"
            f"nv={val_idx.shape[1]}x{val_idx.shape[2]}")
    if aot_dir is not None:
        carry = _aot.cached_call(fit, args, aot_dir, desc)
    else:
        carry = fit(*args)

    (epochs_run, best_val, best_epoch, diverged), buf_h = jax.device_get(
        ((carry[0], carry[2], carry[3], carry[5]), carry[11]))
    epochs_run = int(epochs_run)
    rows = buf_h[:epochs_run]
    if bool(diverged):
        bad = epochs_run - 1
        raise FloatingPointError(
            f"non-finite replica-plan training loss at epoch {bad}: {rows[bad][0]}")
    return EnsembleFitResult(
        state=TrainState(carry[8], carry[9], carry[1].opt_state),
        best_params=carry[6],
        best_bn_state=carry[7],
        best_val_loss=np.asarray(best_val, np.float64),
        best_epoch=np.asarray(best_epoch, np.int64),
        epochs_run=epochs_run,
        train_losses=[np.asarray(r[0], np.float64) for r in rows],
        val_losses=[np.asarray(r[1], np.float64) for r in rows],
    )


def shard_replicas(tree, mesh, axis_name: str = "data"):
    """Place a stacked K-replica pytree with the replica axis sharded over
    ``mesh``'s ``axis_name`` — one (or K/n) replicas per device, so seed
    ensembles and lr sweeps scale to real multi-chip hardware. The replica
    count must divide the mesh axis size evenly (GSPMD tiling rule); data
    arrays stay replicated, so the only collective in the fit program is the
    final metrics gather. Per-replica trajectories TRACK the unsharded
    ensemble but are not bit-equal — partitioning changes the backward's
    fp32 reduction order and first-step Adam amplifies zero-grad conv-bias
    noise to O(lr), the same drift class as vmap-vs-single-model (measured
    ~0.3% on val loss after 3 epochs,
    tests/test_ensemble.py::test_sharded_ensemble_matches)."""
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
