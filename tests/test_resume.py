"""Mid-run resume: an interrupted fit must reproduce the uninterrupted one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.data.device_data import batch_plan
from hippie_tpu.models import cvae
from hippie_tpu.train import loop, optim, step


def _setup(lr=1e-3):
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(lr, 0.01)
    ts = step.TrainState(params, bn, tx.init(params))
    train_epoch, eval_epoch = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=False)
    n = 48
    data = jnp.asarray(np.random.default_rng(0).normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    tr_idx, tr_mask = batch_plan(np.arange(32), 16, shuffle=False)
    va_idx, va_mask = batch_plan(np.arange(32, 48), 16, shuffle=False)

    def run_train(state, key, epoch):
        return train_epoch(state, data, source, source, jnp.asarray(tr_idx), jnp.asarray(tr_mask), key)

    def run_val(state, key, epoch):
        return eval_epoch(state.params, state.bn_state, data, source, source,
                          jnp.asarray(va_idx), jnp.asarray(va_mask), key)

    return ts, run_train, run_val


def test_resume_matches_uninterrupted(tmp_path):
    ts, run_train, run_val = _setup()
    full = loop.fit(ts, run_train_epoch=run_train, run_val_epoch=run_val,
                    max_epochs=4, seed=11, verbose=False)

    ts2, run_train, run_val = _setup()
    rdir = str(tmp_path / "resume")
    part1 = loop.fit(ts2, run_train_epoch=run_train, run_val_epoch=run_val,
                     max_epochs=2, seed=11, verbose=False, resume_dir=rdir)
    # "crash" after epoch 2; resume to 4
    part2 = loop.fit(part1.state, run_train_epoch=run_train, run_val_epoch=run_val,
                     max_epochs=4, seed=11, verbose=False, resume_dir=rdir)

    assert part2.epochs_run == 4
    np.testing.assert_allclose(part2.val_losses, full.val_losses[2:], rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(full.state.params),
        jax.tree_util.tree_leaves(part2.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_resume_preserves_best_from_before_the_interrupt(tmp_path):
    """Crash AFTER the best epoch: the resumed fit must return the TRUE best
    weights, not the resume-point weights mislabeled with the pre-crash best
    metrics. The best snapshot is persisted in the orbax resume state the
    epoch it improves (the Lightning best ckpt is flushed lazily by the
    pipeline trackers, so it cannot be relied on after a crash)."""
    # lr chosen so validation WORSENS after an early best (probed: best at
    # epoch 1 of 6); the scenario precondition is asserted below.
    ts, run_train, run_val = _setup(lr=5e-3)
    full = loop.fit(ts, run_train_epoch=run_train, run_val_epoch=run_val,
                    max_epochs=6, seed=11, verbose=False)
    assert full.best_epoch < 3, "scenario precondition: best before interrupt"

    ts2, run_train, run_val = _setup(lr=5e-3)
    rdir = str(tmp_path / "resume_best")
    part1 = loop.fit(ts2, run_train_epoch=run_train, run_val_epoch=run_val,
                     max_epochs=3, seed=11, verbose=False, resume_dir=rdir)
    # "crash" here: nothing flushed the best ckpt; only the orbax dir survives
    part2 = loop.fit(part1.state, run_train_epoch=run_train, run_val_epoch=run_val,
                     max_epochs=6, seed=11, verbose=False, resume_dir=rdir)

    assert part2.best_epoch == full.best_epoch
    assert part2.best_val_loss == full.best_val_loss
    for a, b in zip(
        jax.tree_util.tree_leaves((full.best_params, full.best_bn_state)),
        jax.tree_util.tree_leaves((part2.best_params, part2.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(full.best_opt_state),
        jax.tree_util.tree_leaves(part2.best_opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_keeps_latest_two(tmp_path):
    import os

    import jax.numpy as jnp

    from hippie_tpu.train import orbax_io, step

    ts = step.TrainState({"w": jnp.zeros((2, 2))}, {"m": jnp.zeros(2)}, {"o": jnp.zeros(1)})
    d = str(tmp_path / "r")
    for e in range(4):
        orbax_io.save_fit_state(d, e, ts, {"best_val": 1.0, "best_epoch": e, "wait": 0})
    entries = sorted(x for x in os.listdir(d) if x.startswith("epoch_"))
    assert entries == ["epoch_000002", "epoch_000003"]
    assert orbax_io.latest_fit_state(d).endswith("epoch_000003")


def test_crashed_save_tmp_dir_is_not_a_resume_source(tmp_path):
    """A process killed mid-save leaves epoch_NNNNNN.orbax-checkpoint-tmp*;
    it sorts AFTER the last complete epoch, so a bare startswith() filter
    would restore the half-written dir (caught live by killing a pipeline
    during an epoch save). latest_fit_state must skip it and the next save
    must reap it."""
    import os

    import jax.numpy as jnp

    from hippie_tpu.train import orbax_io, step

    ts = step.TrainState({"w": jnp.zeros((2, 2))}, {"m": jnp.zeros(2)}, {"o": jnp.zeros(1)})
    d = str(tmp_path / "r")
    orbax_io.save_fit_state(d, 0, ts, {"best_val": 1.0, "best_epoch": 0, "wait": 0})
    tmp_dir = os.path.join(d, "epoch_000001.orbax-checkpoint-tmp")
    os.makedirs(tmp_dir)  # simulated kill mid-save of epoch 1
    assert orbax_io.latest_fit_state(d).endswith("epoch_000000")
    resumed = orbax_io.resume_fit_state(d, ts)
    assert resumed is not None and resumed[0] == 0
    orbax_io.save_fit_state(d, 1, ts, {"best_val": 1.0, "best_epoch": 0, "wait": 0})
    assert not os.path.isdir(tmp_dir)  # reaped by the completed save


@pytest.mark.slow
def test_pipeline_resume_on_mesh_matches_uninterrupted(tmp_path):
    """PIPELINE-level --resume composed with --dp-devices 8 --fsdp: crash
    inside the stage-2 wave fit after one epoch, re-run with resume, and the
    final accuracies + exported embeddings must equal the uninterrupted mesh
    run (the stage-level analogue passes in test_device_fit.py; this covers
    the driver composition — sidecars, AOT keys with shardings, tracker
    flush threads — under sharding)."""
    import pandas as pd

    import hippie_tpu.train.pipeline as pl
    from hippie_tpu.data import synth

    root = tmp_path / "data"
    synth.make_dataset(str(root), "cellexplorer-celltype", n=48, num_classes=3, seed=0)
    synth.make_dataset(str(root), "neonatal-mouse-brain-slice", n=40, wave_width=49, seed=2)

    def cfg(outdir, resume):
        return pl.PipelineConfig(
            z_dim=4, dataset="cellexplorer-celltype", data_root=str(root),
            output_dir=str(tmp_path / outdir / "out"),
            checkpoint_dir=str(tmp_path / outdir / "ck"),
            batch_size=16, supervised_batch_size=16,
            pretrain_max_epochs=2, finetune_max_epochs=2, supervised_max_epochs=2,
            num_blocks=(1, 1, 1, 1), verbose=False,
            dp_devices=8, fsdp=True, resume=resume,
        )

    full = pl.run_pipeline(cfg("full", resume=False))

    calls = []
    orig = pl._fit_unimodal_stage

    def crashing(*a, **kw):
        calls.append(1)
        if len(calls) == 3:  # stage-2 wave: run ONE epoch, then "crash"
            orig(*a, **{**kw, "max_epochs": 1})
            raise KeyboardInterrupt
        return orig(*a, **kw)

    pl._fit_unimodal_stage = crashing
    try:
        with pytest.raises(KeyboardInterrupt):
            pl.run_pipeline(cfg("resumed", resume=True))
    finally:
        pl._fit_unimodal_stage = orig

    resumed = pl.run_pipeline(cfg("resumed", resume=True))

    for kind in ("waveform", "isi", "joint"):
        assert (resumed["best"][kind]["balanced_accuracy"]
                == full["best"][kind]["balanced_accuracy"])
        assert resumed["best"][kind]["k"] == full["best"][kind]["k"]
        a = pd.read_csv(tmp_path / "full" / "out"
                        / f"cellexplorer-celltype_{kind}_embeddings.csv")
        b = pd.read_csv(tmp_path / "resumed" / "out"
                        / f"cellexplorer-celltype_{kind}_embeddings.csv")
        pd.testing.assert_frame_equal(a, b)
