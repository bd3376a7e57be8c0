"""Vmapped K-replica ensemble training (train/ensemble.py).

Contract under test: replica k of an ensemble epoch is the SAME trajectory a
single-model train_epoch produces when started from the same init and given
the k-th per-replica key stream — vmap must change wall-clock, not math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.data import device_data
from hippie_tpu.models import cvae
from hippie_tpu.train import ensemble, optim, step


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n = 40
    data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    class_ = jnp.asarray(rng.integers(0, 3, size=n).astype(np.int32))
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_classes=3, num_blocks=(1, 1, 1, 1))
    idx, mask = device_data.batch_plan(np.arange(n), 16, shuffle=False)
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)
    return data, source, class_, cfg, idx, mask


def _init(cfg, tx, k, seed=1):
    return ensemble.init_unimodal_ensemble(jax.random.PRNGKey(seed), cfg, tx, k)


def test_replica_matches_single_model_run(setup):
    data, source, class_, cfg, idx, mask = setup
    K = 2
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    ts = _init(cfg, tx, K)
    e_train, e_eval = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)
    s_train, s_eval = step.make_unimodal_epoch_fns(tx, beta=1.0)

    root = jax.random.PRNGKey(11)
    rkeys = jax.random.split(root, K)

    # Single-model runs seeded from the SAME stacked init (replica k).
    singles = []
    for k in range(K):
        ts_k = step.TrainState(
            ensemble.take_replica(ts.params, k),
            ensemble.take_replica(ts.bn_state, k),
            ensemble.take_replica(ts.opt_state, k),
        )
        ts_k, tms_k = s_train(ts_k, data, source, class_, idx, mask, rkeys[k])
        vms_k = s_eval(ts_k.params, ts_k.bn_state, data, source, class_, idx, mask, rkeys[k])
        singles.append((ts_k, tms_k, vms_k))

    ts2, tms = e_train(ts, data, source, class_, idx, mask, root)
    vms = e_eval(ts2.params, ts2.bn_state, data, source, class_, idx, mask, root)

    for k in range(K):
        ts_k, tms_k, vms_k = singles[k]
        # First batch runs on identical params with the identical key — the
        # vmapped forward+loss is bit-equivalent to the single model's
        # (verified exact on this config; tolerance only guards fusion drift).
        np.testing.assert_allclose(
            float(np.asarray(tms.loss)[0, k]), float(np.asarray(tms_k.loss)[0]),
            rtol=1e-6)
        # Later batches: vmap changes fp32 reduction order in the backward,
        # and first-step Adam turns noise-level gradients (conv biases feeding
        # BN have mathematically zero grads) into O(lr) sign flips — same
        # noise class tests/test_train_step.py excludes vs torch. Trajectories
        # stay equivalent, not bit-equal.
        np.testing.assert_allclose(
            np.asarray(tms.loss)[:, k], np.asarray(tms_k.loss), rtol=5e-3)
        np.testing.assert_allclose(
            np.asarray(vms.loss)[:, k], np.asarray(vms_k.loss), rtol=5e-3)
        flat_e = jax.tree_util.tree_leaves(ensemble.take_replica(ts2.params, k))
        flat_s = jax.tree_util.tree_leaves(ts_k.params)
        for a, b in zip(flat_e, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=0.02)

    # and the two replicas actually differ from each other (different inits/noise)
    assert not np.allclose(np.asarray(tms.loss)[:, 0], np.asarray(tms.loss)[:, 1])


def test_per_replica_learning_rates(setup):
    data, source, class_, cfg, idx, mask = setup
    K = 3
    tx = optim.make_optimizer(3e-3, 0.01)
    ts = _init(cfg, tx, K)
    # replicas share ONE init so only lr differs
    p0 = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[:1], x.shape), ts.params)
    ts = step.TrainState(p0, jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], x.shape), ts.bn_state), ts.opt_state)
    lrs = [0.0, 1e-3, 1e-2]
    ts = ts._replace(opt_state=ensemble.set_ensemble_lr(ts.opt_state, lrs))
    with pytest.raises(ValueError):
        ensemble.set_ensemble_lr(ts.opt_state, [1e-3] * (K + 1))

    e_train, _ = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)
    # snapshot before the donating train epoch invalidates ts's buffers
    leaf0 = np.asarray(jax.tree_util.tree_leaves(p0)[0])
    ts2, _ = e_train(ts, data, source, class_, idx, mask, jax.random.PRNGKey(0))

    leaf2 = np.asarray(jax.tree_util.tree_leaves(ts2.params)[0])
    # lr=0 replica is frozen; the others moved, bigger lr moved further
    np.testing.assert_array_equal(leaf2[0], leaf0[0])
    d1 = float(np.abs(leaf2[1] - leaf0[1]).max())
    d2 = float(np.abs(leaf2[2] - leaf0[2]).max())
    assert d1 > 0 and d2 > d1


def test_fit_ensemble_tracks_per_replica_best(setup):
    data, source, class_, cfg, idx, mask = setup
    K = 2
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    ts = _init(cfg, tx, K)
    e_train, e_eval = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)

    res = ensemble.fit_ensemble(
        ts,
        run_train_epoch=lambda s, key, e: e_train(s, data, source, class_, idx, mask, key),
        run_val_epoch=lambda s, key, e: e_eval(
            s.params, s.bn_state, data, source, class_, idx, mask, key),
        max_epochs=3,
        early_stopping_patience=None,
        seed=5,
    )
    assert res.epochs_run == 3
    assert res.best_val_loss.shape == (K,)
    assert len(res.train_losses) == 3 and res.train_losses[0].shape == (K,)
    # the recorded best snapshot reproduces the recorded best val loss
    for k in range(K):
        be = int(res.best_epoch[k])
        assert 0 <= be < 3
        np.testing.assert_allclose(
            res.best_val_loss[k],
            np.asarray(res.val_losses[be])[k], rtol=1e-6)
    # best snapshot differs from final state when best epoch != last
    _, e_eval2 = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)
    vkey = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(5), 2 * 2), 2)
    vms = e_eval2(res.best_params, res.best_bn_state, data, source, class_, idx, mask, vkey)
    assert np.all(np.isfinite(np.asarray(vms.loss)))


def test_fit_ensemble_transient_nan_val_does_not_poison_best(setup):
    """A replica whose VAL loss transiently goes non-finite (high-lr
    exploration it later recovers from — observed live on TPU at lr=0.01)
    must not freeze its best tracker: np.minimum propagates nan forever,
    where(improved) skips it (the device loop's semantics)."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    ts = _init(cfg, tx, K)
    e_train, e_eval = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)

    def run_val(s, key, e):
        m = e_eval(s.params, s.bn_state, data, source, class_, idx, mask, key)
        if e == 1:  # replica 0 diverges at val for one epoch only
            m = m._replace(loss=m.loss.at[:, 0].set(jnp.nan))
        return m

    res = ensemble.fit_ensemble(
        ts,
        run_train_epoch=lambda s, key, e: e_train(s, data, source, class_, idx, mask, key),
        run_val_epoch=run_val,
        max_epochs=4, early_stopping_patience=None, seed=5)

    assert res.epochs_run == 4
    vl = np.stack(res.val_losses)  # [4, K], row 1 col 0 is nan
    assert np.isnan(vl[1, 0]) and np.isfinite(vl[[0, 2, 3], 0]).all()
    # replica 0's best is the min over its FINITE epochs, not nan
    fin = vl[[0, 2, 3], 0]
    assert np.isfinite(res.best_val_loss).all()
    np.testing.assert_allclose(res.best_val_loss[0], fin.min(), rtol=1e-6)
    assert int(res.best_epoch[0]) == [0, 2, 3][int(np.argmin(fin))]
    # the snapshot reproduces the recorded best, so it was never overwritten
    # by the nan epoch's params
    np.testing.assert_allclose(
        res.best_val_loss[1],
        vl[int(res.best_epoch[1]), 1], rtol=1e-6)


def test_device_fit_ensemble_matches_host(setup):
    """The whole-sweep-on-device loop follows the host fit_ensemble
    trajectory when the host is driven on the canonical bucketed plan
    (the lr_sweep --fit-loop host path)."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    n = int(data.shape[0])
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    seed = 7
    max_epochs, patience, B = 5, None, 16

    va_plan = device_data.batch_plan(va_idx, B, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))

    # ---- host loop (per-epoch dispatches) -------------------------------
    ts_h = _init(cfg, tx, K, seed=5)
    e_train, e_eval = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=1.0)

    def run_train(s, key, epoch):
        pidx, pmask, nb = device_data.host_epoch_plan(
            tr_idx, B, True, jax.random.fold_in(key, 0))
        return e_train(s, data, source, None, jnp.asarray(pidx[:nb]),
                       jnp.asarray(pmask[:nb]), jax.random.fold_in(key, 1))

    def run_val(s, key, epoch):
        return e_eval(s.params, s.bn_state, data, source, None,
                      va_plan[0], va_plan[1], key)

    host = ensemble.fit_ensemble(
        ts_h, run_train_epoch=run_train, run_val_epoch=run_val,
        max_epochs=max_epochs, early_stopping_patience=patience, seed=seed)

    # ---- device loop (one dispatch) --------------------------------------
    ts_d = _init(cfg, tx, K, seed=5)
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    dev = ensemble.device_fit_ensemble(
        ts_d, batch_step=batch_step, eval_step=eval_step,
        arrays=(data,), source=source, class_=None,
        train_stream=tr_idx, batch_size=B,
        val_idx=va_plan[0], val_mask=va_plan[1], val_nb=va_plan[0].shape[0],
        max_epochs=max_epochs, early_stopping_patience=patience, seed=seed)

    assert dev.epochs_run == host.epochs_run
    np.testing.assert_array_equal(dev.best_epoch, host.best_epoch)
    np.testing.assert_allclose(
        np.stack(dev.train_losses), np.stack(host.train_losses), rtol=1e-5)
    np.testing.assert_allclose(
        np.stack(dev.val_losses), np.stack(host.val_losses), rtol=1e-5)
    np.testing.assert_allclose(dev.best_val_loss, host.best_val_loss, rtol=1e-5)
    # best snapshots per replica
    for k in range(K):
        for a, b in zip(
            jax.tree_util.tree_leaves(ensemble.take_replica(dev.best_params, k)),
            jax.tree_util.tree_leaves(ensemble.take_replica(host.best_params, k)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_device_fit_ensemble_early_stop_and_chunks(setup):
    """Chunked execution (progress_every) is trajectory-identical to the
    single dispatch, and joint early stopping fires once every replica
    stalls."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    tr_idx, va_idx = np.arange(30), np.arange(30, int(data.shape[0]))
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)

    kw = dict(
        batch_step=batch_step, eval_step=eval_step, arrays=(data,),
        source=source, class_=None, train_stream=tr_idx, batch_size=16,
        val_idx=va_plan[0], val_mask=va_plan[1], val_nb=va_plan[0].shape[0],
        max_epochs=6, early_stopping_patience=1, seed=3)
    one = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9), **kw)
    chk = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                       progress_every=2, **kw)
    assert one.epochs_run == chk.epochs_run
    np.testing.assert_array_equal(np.stack(one.val_losses), np.stack(chk.val_losses))
    if one.epochs_run < 6:  # early stop fired: every replica waited >= 1
        waits = one.epochs_run - 1 - one.best_epoch
        assert np.all(waits >= 1)


def test_device_fit_ensemble_multimodal(setup):
    """Two-data-array (multimodal) ensembles: the fit program's replica
    vmap must size its in_axes from len(arrays), not assume one array
    (regression: hardcoded unimodal in_axes crashed multimodal sweeps at
    trace time). Determinism across identical calls is bit-exact."""
    data, source, class_, cfg, idx, mask = setup
    rng = np.random.default_rng(7)
    n = int(data.shape[0])
    isi = jnp.asarray(rng.normal(size=(n, 100)).astype(np.float32))
    K = 2
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))

    mcfg = cvae.MultiModalConfig(
        z_dim=4, output_size_wave=50, output_size_isi=100,
        num_sources=1, num_classes=3, num_blocks=(1, 1, 1, 1))

    def init():
        p0, s0 = cvae.multimodal_cvae_init(jax.random.PRNGKey(5), mcfg)
        bcast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape).copy(), t)
        params, bn = bcast(p0), bcast(s0)
        return step.TrainState(params, bn, jax.vmap(tx.init)(params))

    batch_step, eval_step = step.make_multimodal_steps(tx, beta=1.0)
    kw = dict(
        batch_step=batch_step, eval_step=eval_step, arrays=(data, isi),
        source=source, class_=None, train_stream=tr_idx, batch_size=16,
        val_idx=va_plan[0], val_mask=va_plan[1], val_nb=va_plan[0].shape[0],
        max_epochs=3, early_stopping_patience=None, seed=3)
    a = ensemble.device_fit_ensemble(init(), **kw)
    b = ensemble.device_fit_ensemble(init(), **kw)

    assert a.epochs_run == 3
    assert np.all(np.isfinite(np.stack(a.train_losses)))
    assert np.all(np.isfinite(a.best_val_loss))
    assert a.best_val_loss.shape == (K,)
    np.testing.assert_array_equal(np.stack(a.val_losses), np.stack(b.val_losses))
    for leaf in jax.tree_util.tree_leaves(a.best_params):
        assert leaf.shape[0] == K


def _resume_kw(data, source, tr_idx, va_plan, **over):
    kw = dict(
        arrays=(data,), source=source, class_=None, train_stream=tr_idx,
        batch_size=16, val_idx=va_plan[0], val_mask=va_plan[1],
        val_nb=va_plan[0].shape[0], early_stopping_patience=None, seed=3)
    kw.update(over)
    return kw


def test_device_fit_ensemble_resume_matches_uninterrupted(setup, tmp_path):
    """A killed sweep resumes bit-equal to the uninterrupted run: the stacked
    TrainState, the [K] best/wait counters AND the per-replica best
    snapshots round-trip through one atomic orbax payload (per-epoch RNG
    derives from (seed, epoch), so the trajectory re-derives exactly)."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    n = int(data.shape[0])
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    kw = _resume_kw(data, source, tr_idx, va_plan,
                    batch_step=batch_step, eval_step=eval_step)

    full = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                        max_epochs=6, **kw)

    rdir = str(tmp_path / "ens_resume")
    part1 = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                         max_epochs=3, resume_dir=rdir, **kw)
    assert part1.epochs_run == 3
    part2 = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                         max_epochs=6, resume_dir=rdir, **kw)

    assert part2.epochs_run == 6
    # loss lists cover only the epochs THIS call ran (device_fit convention)
    np.testing.assert_array_equal(np.stack(part2.val_losses),
                                  np.stack(full.val_losses[3:]))
    np.testing.assert_array_equal(np.stack(part2.train_losses),
                                  np.stack(full.train_losses[3:]))
    np.testing.assert_array_equal(part2.best_epoch, full.best_epoch)
    np.testing.assert_array_equal(part2.best_val_loss, full.best_val_loss)
    for a, b in zip(
        jax.tree_util.tree_leaves(
            (part2.state.params, part2.best_params, part2.best_bn_state)),
        jax.tree_util.tree_leaves(
            (full.state.params, full.best_params, full.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fit_ensemble_resume_preserves_best_before_interrupt(setup, tmp_path):
    """Crash AFTER a replica's best epoch: the resumed EnsembleFitResult must
    return that replica's TRUE best weights from the persisted snapshot even
    when no post-resume epoch improves it."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    n = int(data.shape[0])
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(1e-2, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    kw = _resume_kw(data, source, tr_idx, va_plan,
                    batch_step=batch_step, eval_step=eval_step)

    full = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                        max_epochs=4, **kw)
    assert np.any(full.best_epoch < 2), \
        "scenario precondition: some replica's best falls before the interrupt"

    rdir = str(tmp_path / "ens_resume_best")
    ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                 max_epochs=2, resume_dir=rdir, **kw)
    part2 = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                         max_epochs=4, resume_dir=rdir, **kw)

    np.testing.assert_array_equal(part2.best_epoch, full.best_epoch)
    np.testing.assert_array_equal(part2.best_val_loss, full.best_val_loss)
    for a, b in zip(
        jax.tree_util.tree_leaves((part2.best_params, part2.best_bn_state)),
        jax.tree_util.tree_leaves((full.best_params, full.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fit_ensemble_resume_of_stopped_sweep_is_noop(setup, tmp_path):
    """Resuming a sweep whose joint early stop already fired must not train
    further (restored wait >= patience is re-checked BEFORE running). The
    stopped state is CONSTRUCTED (wait counters bumped past patience in the
    saved payload) — whether a live sweep early-stops within N epochs is
    stochastic, which is no basis for a test precondition."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    n = int(data.shape[0])
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    kw = _resume_kw(data, source, tr_idx, va_plan,
                    batch_step=batch_step, eval_step=eval_step)

    rdir = str(tmp_path / "ens_resume_stop")
    r1 = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                      max_epochs=3, resume_dir=rdir, **kw)
    assert r1.epochs_run == 3

    from hippie_tpu.train import orbax_io

    epoch, st, extras, best = orbax_io.resume_ensemble_fit_state(
        rdir, _init(cfg, tx, K, seed=9))
    extras = dict(extras)
    extras["wait"] = np.full((K,), 7, np.int32)  # every replica stalled
    orbax_io.save_ensemble_fit_state(rdir, epoch, st, extras, best)

    kw["early_stopping_patience"] = 1
    r2 = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9),
                                      max_epochs=12, resume_dir=rdir, **kw)
    assert r2.epochs_run == r1.epochs_run
    assert r2.train_losses == []
    np.testing.assert_array_equal(r2.best_epoch, r1.best_epoch)
    np.testing.assert_array_equal(r2.best_val_loss, r1.best_val_loss)
    for a, b in zip(
        jax.tree_util.tree_leaves((r1.best_params, r1.best_bn_state)),
        jax.tree_util.tree_leaves((r2.best_params, r2.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_ensemble_matches(setup):
    """Replica axis sharded over a 2-device mesh: per-replica losses TRACK
    the single-device ensemble. Not bit-equal: GSPMD partitioning changes
    the backward's fp32 reduction order, and first-step Adam amplifies
    zero-grad conv-bias noise to O(lr) — the documented vmap-vs-single
    drift class (module docstring), measured ~0.3% here."""
    from jax.sharding import Mesh

    data, source, class_, cfg, idx, mask = setup
    K = 2
    tr_idx, va_idx = np.arange(30), np.arange(30, int(data.shape[0]))
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    va_plan = device_data.batch_plan(va_idx, 16, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    kw = dict(
        batch_step=batch_step, eval_step=eval_step, arrays=(data,),
        source=source, class_=None, train_stream=tr_idx, batch_size=16,
        val_idx=va_plan[0], val_mask=va_plan[1], val_nb=va_plan[0].shape[0],
        max_epochs=3, early_stopping_patience=None, seed=3)

    base = ensemble.device_fit_ensemble(_init(cfg, tx, K, seed=9), **kw)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("replica",))
    ts_s = jax.tree_util.tree_map(
        lambda x: x, _init(cfg, tx, K, seed=9))
    ts_s = step.TrainState(*ensemble.shard_replicas(
        (ts_s.params, ts_s.bn_state, ts_s.opt_state), mesh, "replica"))
    shard = ensemble.device_fit_ensemble(ts_s, **kw)

    np.testing.assert_allclose(
        np.stack(shard.val_losses), np.stack(base.val_losses), rtol=1.5e-2)
    np.testing.assert_allclose(shard.best_val_loss, base.best_val_loss, rtol=1.5e-2)


def test_replica_plans_matches_shared_plan_loop(setup):
    """device_fit_replica_plans with every replica on the SAME fixed plan is
    on the shared-plan device loop's shuffle=False trajectory — one key
    derivation (fold_in(tkey, 1)), one plan convention (duplicate-last-real),
    so the per-replica-plan program generalizes the shared-plan one."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    n = int(data.shape[0])
    tr_idx, va_idx = np.arange(30), np.arange(30, n)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    seed, max_epochs, B = 7, 4, 16
    va_plan = device_data.batch_plan(va_idx, B, shuffle=False)
    tr_plan = device_data.batch_plan(tr_idx, B, shuffle=False)
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)

    shared = ensemble.device_fit_ensemble(
        _init(cfg, tx, K, seed=5), batch_step=batch_step, eval_step=eval_step,
        arrays=(data,), source=source, class_=None,
        train_stream=tr_idx, batch_size=B, shuffle=False,
        val_idx=jnp.asarray(va_plan[0]), val_mask=jnp.asarray(va_plan[1]),
        val_nb=va_plan[0].shape[0],
        max_epochs=max_epochs, early_stopping_patience=None, seed=seed)
    stacked = ensemble.device_fit_replica_plans(
        _init(cfg, tx, K, seed=5), batch_step=batch_step, eval_step=eval_step,
        arrays=(data,), source=source, class_=None,
        train_idx=np.stack([tr_plan[0]] * K), train_mask=np.stack([tr_plan[1]] * K),
        val_idx=np.stack([va_plan[0]] * K), val_mask=np.stack([va_plan[1]] * K),
        max_epochs=max_epochs, early_stopping_patience=None, seed=seed)

    assert stacked.epochs_run == shared.epochs_run
    np.testing.assert_allclose(
        np.stack(stacked.train_losses), np.stack(shared.train_losses), rtol=1e-5)
    np.testing.assert_allclose(
        np.stack(stacked.val_losses), np.stack(shared.val_losses), rtol=1e-5)
    np.testing.assert_array_equal(stacked.best_epoch, shared.best_epoch)
    for k in range(K):
        for a, b in zip(
            jax.tree_util.tree_leaves(ensemble.take_replica(stacked.best_params, k)),
            jax.tree_util.tree_leaves(ensemble.take_replica(shared.best_params, k)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_replica_plans_per_replica_freeze(setup):
    """Each replica's final state freezes at ITS OWN early-stop epoch (the
    sequential fit's last-epoch contract) while others train on: replica k's
    frozen state is bit-equal to re-running the same program with the epoch
    budget truncated at k's stop epoch and no patience."""
    data, source, class_, cfg, idx, mask = setup
    K = 2
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
    seed, B, patience, max_epochs = 11, 16, 1, 8
    # different plans per replica: overlapping but distinct row ranges
    tr0, tr1 = np.arange(0, 20), np.arange(10, 30)
    va0, va1 = np.arange(30, 35), np.arange(35, 40)
    t_plans = [device_data.batch_plan(t, B, shuffle=False) for t in (tr0, tr1)]
    v_plans = [device_data.batch_plan(v, B, shuffle=False) for v in (va0, va1)]
    t_idx = np.stack([p[0] for p in t_plans])
    t_mask = np.stack([p[1] for p in t_plans])
    v_idx = np.stack([p[0] for p in v_plans])
    v_mask = np.stack([p[1] for p in v_plans])
    batch_step, eval_step = step.make_unimodal_steps(tx, beta=1.0)
    kw = dict(batch_step=batch_step, eval_step=eval_step, arrays=(data,),
              source=source, class_=None, train_idx=t_idx, train_mask=t_mask,
              val_idx=v_idx, val_mask=v_mask, seed=seed)

    full = ensemble.device_fit_replica_plans(
        _init(cfg, tx, K, seed=13), max_epochs=max_epochs,
        early_stopping_patience=patience, **kw)

    # per-replica stop epoch, re-derived from the val-loss trajectory
    vl = np.stack(full.val_losses)  # [E, K]
    stop_epoch = np.full((K,), full.epochs_run - 1, np.int64)
    for k in range(K):
        best, wait = np.inf, 0
        for e in range(full.epochs_run):
            if vl[e, k] < best:
                best, wait = vl[e, k], 0
            else:
                wait += 1
            if wait >= patience:
                stop_epoch[k] = e
                break
    assert full.epochs_run == int(stop_epoch.max()) + 1  # joint stop fired

    for k in range(K):
        trunc = ensemble.device_fit_replica_plans(
            _init(cfg, tx, K, seed=13), max_epochs=int(stop_epoch[k]) + 1,
            early_stopping_patience=None, **kw)
        for a, b in zip(
            jax.tree_util.tree_leaves(ensemble.take_replica(full.state.params, k)),
            jax.tree_util.tree_leaves(ensemble.take_replica(trunc.state.params, k)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(ensemble.take_replica(full.state.bn_state, k)),
            jax.tree_util.tree_leaves(ensemble.take_replica(trunc.state.bn_state, k)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
