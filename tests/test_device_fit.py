"""device_fit (whole-fit-as-one-while_loop) vs the host epoch loop.

The two paths must produce the same trajectory: identical per-epoch losses,
the same best epoch/val, the same early-stop point, and matching final /
best parameters — the device fit derives its per-epoch RNG keys exactly like
loop.fit, so any drift is a bug (not tolerance).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.models import cvae
from hippie_tpu.train import optim, pipeline, step


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _tiny_stage(fit_loop, *, max_epochs=5, patience=None, shuffle=True,
                use_class_labels=False, limit=None, seed=7, optimizer="adamw",
                aot_dir=None, progress_every=None, log_every_step=False,
                resume_dir=None, dp_devices=None, fsdp=False):
    cfg = pipeline.PipelineConfig(
        verbose=False, fit_loop=fit_loop, early_stopping_patience=patience,
        limit_train_batches=limit, seed=seed, optimizer=optimizer,
        aot_dir=aot_dir, progress_every=progress_every,
        log_every_step=log_every_step, dp_devices=dp_devices, fsdp=fsdp,
    )
    rng = np.random.default_rng(0)
    n = 52
    data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    class_ = jnp.asarray(rng.integers(0, 3, size=n).astype(np.int32))
    cfg_m = cvae.CVAEConfig(z_dim=4, output_size=50, num_classes=3, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(1), cfg_m)
    tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0, algorithm=optimizer)
    ts = step.TrainState(params, bn, tx.init(params))
    logs = []
    cfg = dataclasses.replace(cfg, log_fn=logs.append)
    res = pipeline._fit_unimodal_stage(
        cfg=cfg, ts=ts, tx=tx, data=data, source=source, class_=class_,
        train_indices=np.arange(40), val_indices=np.arange(40, n),
        batch_size=16, max_epochs=max_epochs, beta=1.0,
        use_class_labels=use_class_labels, shuffle_train=shuffle, stage_seed=3,
        lr=3e-3, resume_dir=resume_dir,
    )
    return res, logs


@pytest.mark.parametrize("shuffle,use_cls,limit", [
    (True, False, None),
    (False, True, None),
    (True, False, 2),
    (True, False, 0.5),  # Lightning-style fractional limit
])
def test_device_fit_matches_host_loop(shuffle, use_cls, limit):
    r_host, logs_h = _tiny_stage("host", shuffle=shuffle,
                                 use_class_labels=use_cls, limit=limit)
    r_dev, logs_d = _tiny_stage("device", shuffle=shuffle,
                                use_class_labels=use_cls, limit=limit)

    assert r_host.epochs_run == r_dev.epochs_run
    assert r_host.best_epoch == r_dev.best_epoch
    np.testing.assert_allclose(r_dev.train_losses, r_host.train_losses, rtol=2e-5)
    np.testing.assert_allclose(r_dev.val_losses, r_host.val_losses, rtol=2e-5)
    assert abs(r_dev.best_val_loss - r_host.best_val_loss) < 1e-5 * max(
        1.0, abs(r_host.best_val_loss)
    )
    # parameter trajectories must coincide (XLA scheduling noise only)
    for leaf_d, leaf_h in zip(
        jax.tree_util.tree_leaves(r_dev.state.params),
        jax.tree_util.tree_leaves(r_host.state.params),
    ):
        assert _rel(leaf_d, leaf_h) < 1e-4
    for leaf_d, leaf_h in zip(
        jax.tree_util.tree_leaves(r_dev.best_params),
        jax.tree_util.tree_leaves(r_host.best_params),
    ):
        assert _rel(leaf_d, leaf_h) < 1e-4
    # per-epoch logs replayed with the same schema and values
    assert [l["epoch"] for l in logs_d] == [l["epoch"] for l in logs_h]
    for ld, lh in zip(logs_d, logs_h):
        for k in ("train_loss", "val_loss", "train_mse", "train_kl", "lr"):
            assert abs(ld[k] - lh[k]) <= 2e-5 * max(1.0, abs(lh[k])), (k, ld, lh)


def test_device_fit_early_stop_matches_host():
    # patience small enough that the stop fires mid-run; both paths must stop
    # at the same epoch with the same best snapshot
    r_host, _ = _tiny_stage("host", max_epochs=12, patience=2)
    r_dev, _ = _tiny_stage("device", max_epochs=12, patience=2)
    assert r_host.epochs_run == r_dev.epochs_run
    assert r_host.best_epoch == r_dev.best_epoch
    np.testing.assert_allclose(r_dev.val_losses, r_host.val_losses, rtol=2e-5)


def test_device_fit_chunked_progress_identical_trajectory():
    """progress_every runs the SAME compiled fit in epoch chunks (live logs
    between chunks); losses/best/early-stop must be bit-compatible with the
    single-dispatch run, including when the stop fires mid-chunk."""
    r_one, logs_one = _tiny_stage("device", max_epochs=9, patience=2, progress_every=0)
    r_chk, logs_chk = _tiny_stage("device", max_epochs=9, patience=2, progress_every=2)
    assert r_one.epochs_run == r_chk.epochs_run
    assert r_one.best_epoch == r_chk.best_epoch
    np.testing.assert_array_equal(r_chk.train_losses, r_one.train_losses)
    np.testing.assert_array_equal(r_chk.val_losses, r_one.val_losses)
    assert logs_chk == logs_one
    for leaf_c, leaf_o in zip(
        jax.tree_util.tree_leaves(r_chk.best_params),
        jax.tree_util.tree_leaves(r_one.best_params),
    ):
        np.testing.assert_array_equal(np.asarray(leaf_c), np.asarray(leaf_o))


def test_device_fit_per_step_logging():
    """log_every_step emits one {train_loss_step,...} record per executed
    train batch; their per-epoch mean equals the epoch train_loss record."""
    res, logs = _tiny_stage("device", max_epochs=3, log_every_step=True)
    epoch_recs = [l for l in logs if "train_loss" in l]
    step_recs = [l for l in logs if "train_loss_step" in l]
    nb = 3  # 40 train samples / batch 16 -> 3 executed batches (masked tail)
    assert len(step_recs) == 3 * nb
    assert [r["step"] for r in step_recs] == list(range(3 * nb))
    for e in range(3):
        mine = [r["train_loss_step"] for r in step_recs if r["epoch"] == e]
        assert len(mine) == nb
        want = next(r["train_loss"] for r in epoch_recs if r["epoch"] == e)
        assert abs(float(np.mean(mine)) - want) < 2e-5 * max(1.0, abs(want))


def test_device_fit_zero_epochs():
    r_dev, logs = _tiny_stage("device", max_epochs=0)
    assert r_dev.epochs_run == 0 and r_dev.best_epoch == -1
    assert logs == []
    assert r_dev.best_params is r_dev.state.params


def test_device_fit_multimodal_smoke():
    cfg = pipeline.PipelineConfig(verbose=False, fit_loop="device")
    rng = np.random.default_rng(5)
    n = 36
    wave = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    isi = jnp.asarray(rng.normal(size=(n, 100)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    class_ = jnp.zeros((n,), jnp.int32)
    cfg_m = cvae.MultiModalConfig(z_dim=4, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.multimodal_cvae_init(jax.random.PRNGKey(2), cfg_m)
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=1.0)
    ts = step.TrainState(params, bn, tx.init(params))
    res = pipeline._fit_multimodal_stage(
        cfg=cfg, ts=ts, tx=tx, wave=wave, isi=isi, source=source, class_=class_,
        train_indices=np.arange(28), val_indices=np.arange(28, n),
        batch_size=16, max_epochs=2, use_class_labels=False, shuffle_train=True,
        stage_seed=9,
    )
    assert res.epochs_run == 2
    assert np.isfinite(res.train_losses).all() and np.isfinite(res.val_losses).all()


def test_schedule_free_stage_host_device_parity():
    """--optimizer schedule-free: both fit loops run, evaluate at the averaged
    x iterate, and stay on one trajectory; returned params ARE the x iterate
    (differ from a plain-AdamW run's)."""
    r_host, _ = _tiny_stage("host", optimizer="schedule-free")
    r_dev, _ = _tiny_stage("device", optimizer="schedule-free")
    assert r_host.epochs_run == r_dev.epochs_run == 5
    np.testing.assert_allclose(r_dev.val_losses, r_host.val_losses, rtol=2e-5)
    for leaf_d, leaf_h in zip(
        jax.tree_util.tree_leaves(r_dev.best_params),
        jax.tree_util.tree_leaves(r_host.best_params),
    ):
        assert _rel(leaf_d, leaf_h) < 1e-4

    # the optimizer really engaged: its step count equals epochs * batches
    sf = optim.find_schedule_free_state(r_dev.state.opt_state)
    assert sf is not None
    assert int(sf.k) == 5 * 3  # 5 epochs x ceil(40/16) batches
    # the finalized params were converted (eval_params is not identity, so
    # re-applying it to the already-converted params must change them)
    again = optim.eval_params_jit(r_dev.state.opt_state, r_dev.state.params)
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(again),
                        jax.tree_util.tree_leaves(r_dev.state.params))
    ]
    assert max(diffs) > 0.0

    r_adam, _ = _tiny_stage("device", optimizer="adamw")
    assert abs(r_adam.val_losses[-1] - r_dev.val_losses[-1]) > 1e-8


def test_aot_cached_fit_matches_and_reuses(tmp_path):
    """--aot-dir: the exported-program path returns the same FitResult and a
    second run deserializes the cached program instead of re-exporting."""
    import os

    r_plain, _ = _tiny_stage("device")
    aot = str(tmp_path / "aot")
    r_aot, _ = _tiny_stage("device", aot_dir=aot)
    files = os.listdir(aot)
    assert len(files) == 1 and files[0].startswith("prog_")
    np.testing.assert_allclose(r_aot.train_losses, r_plain.train_losses, rtol=2e-5)
    np.testing.assert_allclose(r_aot.val_losses, r_plain.val_losses, rtol=2e-5)
    assert r_aot.best_epoch == r_plain.best_epoch
    for a, b in zip(jax.tree_util.tree_leaves(r_aot.best_params),
                    jax.tree_util.tree_leaves(r_plain.best_params)):
        assert _rel(a, b) < 1e-4

    mtime = os.path.getmtime(os.path.join(aot, files[0]))
    r_again, _ = _tiny_stage("device", aot_dir=aot)
    assert os.path.getmtime(os.path.join(aot, files[0])) == mtime  # reused
    np.testing.assert_allclose(r_again.val_losses, r_aot.val_losses, rtol=1e-6)


def test_aot_cache_covers_data_parallel(tmp_path):
    """The executable-format AOT cache applies to --dp-devices runs too
    (the round-2 jax.export format silently skipped them)."""
    import os

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest")
    from hippie_tpu.train import device_fit as dfit

    if not dfit._have_exec_serialization():
        pytest.skip("no serialize_executable in this jax")
    aot = str(tmp_path / "aot_dp")

    def run(aot_dir):
        cfg = pipeline.PipelineConfig(verbose=False, fit_loop="device",
                                      dp_devices=8, aot_dir=aot_dir)
        rng = np.random.default_rng(0)
        n = 52
        data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
        source = jnp.zeros((n,), jnp.int32)
        cfg_m = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
        params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(1), cfg_m)
        tx = optim.make_optimizer(3e-3, 0.01, clip_val=1.0)
        ts = step.TrainState(params, bn, tx.init(params))
        return pipeline._fit_unimodal_stage(
            cfg=cfg, ts=ts, tx=tx, data=data, source=source, class_=source,
            train_indices=np.arange(40), val_indices=np.arange(40, n),
            batch_size=16, max_epochs=3, beta=1.0,
            use_class_labels=False, shuffle_train=True, stage_seed=3, lr=3e-3,
        )

    r_plain = run(None)
    r_aot = run(aot)
    files = [f for f in os.listdir(aot) if f.endswith(".jexec")]
    assert len(files) == 1
    np.testing.assert_allclose(r_aot.val_losses, r_plain.val_losses, rtol=2e-5)
    r_again = run(aot)
    np.testing.assert_allclose(r_again.val_losses, r_aot.val_losses, rtol=1e-6)


def _tiny_mm_stage(fit_loop, lr=1e-3, seed=11):
    cfg = pipeline.PipelineConfig(verbose=False, fit_loop=fit_loop)
    rng = np.random.default_rng(5)
    n = 36
    wave = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    isi = jnp.asarray(rng.normal(size=(n, 100)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    class_ = jnp.zeros((n,), jnp.int32)
    cfg_m = cvae.MultiModalConfig(z_dim=4, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.multimodal_cvae_init(jax.random.PRNGKey(2), cfg_m)
    tx = optim.make_optimizer(lr, 0.01, clip_val=1.0)
    ts = step.TrainState(params, bn, tx.init(params))
    return pipeline._fit_multimodal_stage(
        cfg=cfg, ts=ts, tx=tx, wave=wave, isi=isi, source=source, class_=class_,
        train_indices=np.arange(28), val_indices=np.arange(28, n),
        batch_size=16, max_epochs=3, use_class_labels=False, shuffle_train=True,
        stage_seed=seed,
    )


def test_multimodal_device_fit_matches_host_loop():
    r_host = _tiny_mm_stage("host")
    r_dev = _tiny_mm_stage("device")
    assert r_host.epochs_run == r_dev.epochs_run
    assert r_host.best_epoch == r_dev.best_epoch
    np.testing.assert_allclose(r_dev.train_losses, r_host.train_losses, rtol=2e-5)
    np.testing.assert_allclose(r_dev.val_losses, r_host.val_losses, rtol=2e-5)
    for leaf_d, leaf_h in zip(
        jax.tree_util.tree_leaves(r_dev.best_params),
        jax.tree_util.tree_leaves(r_host.best_params),
    ):
        assert _rel(leaf_d, leaf_h) < 1e-4


def test_device_fit_resume_matches_uninterrupted(tmp_path):
    """--resume now works with the DEFAULT device fit loop: an interrupted
    stage continues bit-exactly (per-epoch RNG derives from (seed, epoch);
    the orbax round trip preserves float32 bits)."""
    r_full, _ = _tiny_stage("device", max_epochs=6)

    rdir = str(tmp_path / "resume_dev")
    r_part1, _ = _tiny_stage("device", max_epochs=3, resume_dir=rdir)
    assert r_part1.epochs_run == 3
    r_part2, logs2 = _tiny_stage("device", max_epochs=6, resume_dir=rdir)

    assert r_part2.epochs_run == 6
    # loss lists cover only the epochs THIS call ran (host-loop convention)
    np.testing.assert_array_equal(r_part2.train_losses, r_full.train_losses[3:])
    np.testing.assert_array_equal(r_part2.val_losses, r_full.val_losses[3:])
    assert [l["epoch"] for l in logs2] == [3, 4, 5]
    for a, b in zip(
        jax.tree_util.tree_leaves(r_part2.state.params),
        jax.tree_util.tree_leaves(r_full.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best tracking continues with the restored counters AND the restored
    # best snapshot, so the full run's best is reproduced regardless of
    # whether the best epoch falls before or after the resume point
    assert r_part2.best_epoch == r_full.best_epoch
    assert r_part2.best_val_loss == r_full.best_val_loss
    for a, b in zip(
        jax.tree_util.tree_leaves(r_part2.best_params),
        jax.tree_util.tree_leaves(r_full.best_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fit_resume_preserves_best_before_interrupt(tmp_path):
    """Crash AFTER the best epoch under the DEFAULT device loop: the resumed
    fit must return the TRUE best weights from the persisted best snapshot,
    not the resume-point weights (the Lightning best ckpt is flushed lazily
    at pipeline end, so a crash leaves only the orbax resume dir)."""
    # max_epochs=3 at the harness lr puts the best at epoch 1 (val trajectory
    # 1.2742, 1.2689, 1.2935); precondition asserted.
    r_full, _ = _tiny_stage("device", max_epochs=3)
    assert r_full.best_epoch < 2, "scenario precondition: best before interrupt"

    rdir = str(tmp_path / "resume_best_dev")
    _tiny_stage("device", max_epochs=2, resume_dir=rdir)
    r_part2, _ = _tiny_stage("device", max_epochs=3, resume_dir=rdir)

    assert r_part2.best_epoch == r_full.best_epoch
    assert r_part2.best_val_loss == r_full.best_val_loss
    for a, b in zip(
        jax.tree_util.tree_leaves((r_full.best_params, r_full.best_bn_state)),
        jax.tree_util.tree_leaves((r_part2.best_params, r_part2.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("fit_loop", ["device", "host"])
def test_resume_of_early_stopped_stage_is_a_noop(tmp_path, fit_loop):
    """Resuming a stage that already early-stopped must NOT train further:
    the restored wait>=patience is re-checked BEFORE running (it used to be
    re-evaluated only after a full extra epoch, so every restart of a
    finished run extended the stage by at least one epoch and diverged the
    trajectory)."""
    rdir = str(tmp_path / f"resume_stop_{fit_loop}")
    r1, _ = _tiny_stage(fit_loop, max_epochs=12, patience=2, resume_dir=rdir)
    assert r1.epochs_run < 12, "scenario precondition: early stop fired"

    r2, logs2 = _tiny_stage(fit_loop, max_epochs=12, patience=2, resume_dir=rdir)
    assert r2.epochs_run == r1.epochs_run  # no additional epochs
    assert r2.train_losses == [] and logs2 == []
    assert r2.best_epoch == r1.best_epoch
    assert r2.best_val_loss == r1.best_val_loss
    for a, b in zip(
        jax.tree_util.tree_leaves((r1.best_params, r1.best_bn_state)),
        jax.tree_util.tree_leaves((r2.best_params, r2.best_bn_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fit_resumes_host_loop_state(tmp_path):
    """The two fit loops share one resume format: a stage interrupted under
    --fit-loop host continues under the default device loop."""
    r_full, _ = _tiny_stage("host", max_epochs=6)

    rdir = str(tmp_path / "resume_cross")
    _tiny_stage("host", max_epochs=3, resume_dir=rdir)
    r_dev, _ = _tiny_stage("device", max_epochs=6, resume_dir=rdir)

    assert r_dev.epochs_run == 6
    np.testing.assert_allclose(r_dev.val_losses, r_full.val_losses[3:], rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(r_dev.state.params),
        jax.tree_util.tree_leaves(r_full.state.params),
    ):
        assert _rel(a, b) < 1e-4


def test_device_fit_resume_relative_dir(tmp_path, monkeypatch):
    """The CLI's default checkpoint dir is the RELATIVE "checkpoints" —
    orbax/tensorstore refuses relative paths on restore, so latest_fit_state
    must abspath (caught E2E: ValueError 'Checkpoint path should be absolute')."""
    monkeypatch.chdir(tmp_path)
    r_full, _ = _tiny_stage("device", max_epochs=4)

    _tiny_stage("device", max_epochs=2, resume_dir="resume_rel")
    r_res, _ = _tiny_stage("device", max_epochs=4, resume_dir="resume_rel")

    assert r_res.epochs_run == 4
    np.testing.assert_array_equal(r_res.val_losses, r_full.val_losses[2:])


def test_device_fit_resume_on_fsdp_mesh(tmp_path):
    """--resume composes with --dp-devices/--fsdp: the orbax restore re-places
    every leaf on the template's mesh sharding (params per-leaf sharded under
    fsdp, plans batch-sharded), so the resumed fit runs on the mesh instead of
    failing with mixed single-device/mesh inputs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest")

    r_full, _ = _tiny_stage("device", max_epochs=4, dp_devices=8, fsdp=True)

    rdir = str(tmp_path / "resume_fsdp")
    _tiny_stage("device", max_epochs=2, dp_devices=8, fsdp=True, resume_dir=rdir)
    r_res, _ = _tiny_stage("device", max_epochs=4, dp_devices=8, fsdp=True,
                           resume_dir=rdir)

    assert r_res.epochs_run == 4
    np.testing.assert_array_equal(r_res.val_losses, r_full.val_losses[2:])
    for a, b in zip(
        jax.tree_util.tree_leaves(r_res.state.params),
        jax.tree_util.tree_leaves(r_full.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fit_divergence_raises_without_nan_log():
    """A non-finite train loss raises FloatingPointError and — like the host
    loop — does NOT emit a log record for the diverged epoch."""
    logs = []
    cfg = pipeline.PipelineConfig(verbose=False, fit_loop="device", log_fn=logs.append)
    rng = np.random.default_rng(0)
    n = 52
    data = jnp.asarray((rng.normal(size=(n, 50)) * 1e3).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    cfg_m = cvae.CVAEConfig(z_dim=4, output_size=50, num_classes=3, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(1), cfg_m)
    tx = optim.make_optimizer(1e18, 0.01)
    ts = step.TrainState(params, bn, tx.init(params))
    with pytest.raises(FloatingPointError):
        pipeline._fit_unimodal_stage(
            cfg=cfg, ts=ts, tx=tx, data=data, source=source, class_=source,
            train_indices=np.arange(40), val_indices=np.arange(40, n),
            batch_size=16, max_epochs=6, beta=1.0,
            use_class_labels=False, shuffle_train=True, stage_seed=3,
        )
    for rec in logs:
        assert np.isfinite(rec["train_loss"]), rec
