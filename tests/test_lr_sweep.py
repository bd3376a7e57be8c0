"""lr-sweep CLI: K configs trained in one vmapped program (scripts/lr_sweep.py)."""

import importlib.util
import json

import jax

import pytest

from hippie_tpu.data import synth


def _load_module():
    spec = importlib.util.spec_from_file_location("lr_sweep", "scripts/lr_sweep.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepdata")
    synth.make_dataset(str(root), "sweep-synth", n=64, wave_width=46,
                       isi_width=100, num_classes=3, seed=0)
    return str(root)


@pytest.fixture(scope="module")
def aot_dir(tmp_path_factory):
    # Never the default ~/.cache dir: tests must not read entries written by
    # other processes (a real-TPU run, another suite) or leave entries behind.
    return str(tmp_path_factory.mktemp("sweepaot"))


def test_lr_mode_zero_lr_loses(synth_root, aot_dir, capsys):
    m = _load_module()
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "wave", "--lrs", "0,3e-3", "--max-epochs", "3",
        "--batch-size", "16", "--num-blocks", "1,1,1,1", "--z-dim", "4",
        "--aot-dir", aot_dir,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["winner_lr"] == 3e-3
    assert rec["best_val_loss"][1] < rec["best_val_loss"][0]
    assert rec["epochs_run"] == 3
    assert len(rec["configs"]) == 2


def test_seeds_mode_runs(synth_root, aot_dir, capsys):
    m = _load_module()
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "time", "--mode", "seeds", "--n-seeds", "2",
        "--lr", "1e-3", "--max-epochs", "2", "--batch-size", "16",
        "--num-blocks", "1,1,1,1", "--z-dim", "4",
        "--aot-dir", aot_dir,
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["mode"] == "seeds"
    assert len(rec["best_val_loss"]) == 2
    # independent seeds: the two replicas trained to different losses
    assert rec["best_val_loss"][0] != rec["best_val_loss"][1]


def test_winner_skips_nonfinite_best(synth_root, capsys, monkeypatch):
    """A replica with a nan/inf best val loss (diverged at val) must never be
    declared the winner — np.argmin alone would return the first nan (seen
    live on TPU: winner lr=0.01 with best_val nan)."""
    import dataclasses

    import numpy as np

    from hippie_tpu.train import ensemble as ens

    m = _load_module()
    orig = ens.device_fit_ensemble

    def poisoned(*a, **kw):
        res = orig(*a, **kw)
        bv = np.asarray(res.best_val_loss).copy()
        bv[0] = np.nan  # first (lowest-index) replica: argmin's nan trap
        return dataclasses.replace(res, best_val_loss=bv)

    monkeypatch.setattr(ens, "device_fit_ensemble", poisoned)
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "wave", "--lrs", "1e-2,3e-3", "--max-epochs", "2",
        "--batch-size", "16", "--num-blocks", "1,1,1,1", "--z-dim", "4",
        "--aot-dir", "",
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["winner_lr"] == 3e-3  # the finite replica wins

    def all_nan(*a, **kw):
        res = orig(*a, **kw)
        bv = np.full_like(np.asarray(res.best_val_loss), np.nan)
        return dataclasses.replace(res, best_val_loss=bv)

    monkeypatch.setattr(ens, "device_fit_ensemble", all_nan)
    with pytest.raises(SystemExit, match="finite"):
        m.main([
            "--dataset", "sweep-synth", "--data-root", synth_root,
            "--pool", "self", "--modality", "wave", "--lrs", "1e-2,3e-3",
            "--max-epochs", "2", "--batch-size", "16",
            "--num-blocks", "1,1,1,1", "--z-dim", "4", "--aot-dir", "",
        ])
    capsys.readouterr()


def test_joint_sweep_and_stage1_seed(tmp_path, capsys):
    """--modality joint sweeps the MultiModalCVAE (two data arrays through
    the vmapped fit program) and its exported winner seeds the multimodal
    pipeline's stage 1 via --stage1-joint-ckpt."""
    import numpy as np

    from hippie_tpu.export import load_model_from_ckpt
    from hippie_tpu.train.pipeline import PipelineConfig, run_pipeline

    root = tmp_path / "data"
    synth.make_dataset(str(root), "cellexplorer-celltype", n=48, num_classes=3, seed=0)
    m = _load_module()

    # host loop cannot run the joint model: clear error, not a trace crash
    with pytest.raises(SystemExit, match="joint"):
        m.main([
            "--dataset", "cellexplorer-celltype", "--data-root", str(root),
            "--pool", "self", "--modality", "joint", "--fit-loop", "host",
            "--lrs", "1e-3", "--max-epochs", "1", "--batch-size", "16",
            "--num-blocks", "1,1,1,1", "--z-dim", "4", "--aot-dir", "",
        ])
    capsys.readouterr()

    path = str(tmp_path / "winner_joint.ckpt")
    rc = m.main([
        "--dataset", "cellexplorer-celltype", "--data-root", str(root),
        "--pool", "self", "--modality", "joint", "--lrs", "0,3e-3",
        "--max-epochs", "2", "--batch-size", "16",
        "--num-blocks", "1,1,1,1", "--z-dim", "4",
        "--export-winner", path, "--aot-dir", "",
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["winner_lr"] == 3e-3  # lr=0 cannot improve
    assert rec["exported"] == path
    lp, lbn, lcfg = load_model_from_ckpt(path, multimodal=True)
    assert lcfg.z_dim == 4 and lcfg.output_size_wave == 50

    cfg = PipelineConfig(
        z_dim=4, dataset="cellexplorer-celltype", data_root=str(root),
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpts"),
        batch_size=16, supervised_batch_size=16, model_type="multimodal",
        pretrain_max_epochs=7,  # must be ignored: stage 1 is ckpt-seeded
        finetune_max_epochs=1, supervised_max_epochs=1,
        num_blocks=(1, 1, 1, 1), verbose=False,
        stage1_joint_ckpt=path,
    )
    results = run_pipeline(cfg)
    assert "load_pool" not in results["timings"]
    assert "pretrain_joint" not in results["timings"]
    acc = results["best"]["joint"]["balanced_accuracy"]
    assert 0.0 <= acc <= 1.0 and np.isfinite(acc)

    # geometry guard + wrong-pipeline guards
    import dataclasses

    with pytest.raises(ValueError, match="geometry"):
        run_pipeline(dataclasses.replace(
            cfg, z_dim=5, output_dir=str(tmp_path / "o2"),
            checkpoint_dir=str(tmp_path / "c2")))
    with pytest.raises(ValueError, match="MULTIMODAL"):
        run_pipeline(dataclasses.replace(cfg, model_type="unimodal"))


def test_export_winner_feeds_pipeline(tmp_path, capsys):
    """The sweep->pipeline loop: export winners for both modalities, run
    stages 2-3 from them (stage-1 fits skipped), geometry guard raises on a
    mismatched config."""
    import numpy as np

    from hippie_tpu.export import load_model_from_ckpt
    from hippie_tpu.train.pipeline import PipelineConfig, run_pipeline

    root = tmp_path / "data"
    synth.make_dataset(str(root), "cellexplorer-celltype", n=48, num_classes=3, seed=0)

    m = _load_module()
    ckpts = {}
    for modality in ("wave", "time"):
        path = str(tmp_path / f"winner_{modality}.ckpt")
        rc = m.main([
            "--dataset", "cellexplorer-celltype", "--data-root", str(root),
            "--pool", "self", "--modality", modality, "--lrs", "1e-3,3e-3",
            "--max-epochs", "2", "--batch-size", "16",
            "--num-blocks", "1,1,1,1", "--z-dim", "4",
            "--export-winner", path, "--aot-dir", "",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["exported"] == path
        ckpts[modality] = (path, rec["winner_lr"], rec["best_val_loss"])
        payload_hp = load_model_from_ckpt(path, multimodal=False)
        assert payload_hp[2].z_dim == 4  # geometry round-trips

    cfg = PipelineConfig(
        z_dim=4, dataset="cellexplorer-celltype", data_root=str(root),
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpts"),
        batch_size=16, supervised_batch_size=16,
        pretrain_max_epochs=7,  # must be ignored: stage 1 is ckpt-seeded
        finetune_max_epochs=1, supervised_max_epochs=1,
        num_blocks=(1, 1, 1, 1), verbose=False,
        stage1_wave_ckpt=ckpts["wave"][0], stage1_time_ckpt=ckpts["time"][0],
    )
    import hippie_tpu.train.pipeline as pl

    calls = []
    orig = pl._fit_unimodal_stage

    def counting(*a, **kw):
        calls.append(kw.get("max_epochs"))
        return orig(*a, **kw)

    pl._fit_unimodal_stage = counting
    try:
        results = run_pipeline(cfg)
    finally:
        pl._fit_unimodal_stage = orig

    # stage-1 fits skipped: 2 finetune + 2 supervised fits only, none with
    # the pretrain epoch budget
    assert len(calls) == 4 and 7 not in calls
    assert "load_pool" not in results["timings"]
    for kind in ("waveform", "isi", "joint"):
        acc = results["best"][kind]["balanced_accuracy"]
        assert 0.0 <= acc <= 1.0 and np.isfinite(acc)

    # geometry guard: a pipeline with a different z_dim must refuse the ckpt
    bad = PipelineConfig(
        z_dim=5, dataset="cellexplorer-celltype", data_root=str(root),
        output_dir=str(tmp_path / "out2"), checkpoint_dir=str(tmp_path / "ck2"),
        num_blocks=(1, 1, 1, 1), verbose=False,
        stage1_wave_ckpt=ckpts["wave"][0], stage1_time_ckpt=ckpts["time"][0],
    )
    with pytest.raises(ValueError, match="geometry"):
        run_pipeline(bad)


def test_export_all_replicas(synth_root, aot_dir, tmp_path, capsys):
    """--export-all writes every replica's best snapshot as a loadable
    Lightning ckpt (pool val loss selects transfer poorly — candidates get
    screened downstream with kfold --refit instead)."""
    m = _load_module()
    prefix = str(tmp_path / "cand_")
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "wave", "--mode", "seeds", "--n-seeds", "2",
        "--lr", "1e-3", "--max-epochs", "2", "--batch-size", "16",
        "--num-blocks", "1,1,1,1", "--z-dim", "4",
        "--export-all", prefix, "--aot-dir", aot_dir,
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["exported_all"] == [f"{prefix}0.ckpt", f"{prefix}1.ckpt"]

    from hippie_tpu import export as hexport

    p0, _s0, cfg0 = hexport.load_model_from_ckpt(f"{prefix}0.ckpt", multimodal=False)
    p1, _s1, _ = hexport.load_model_from_ckpt(f"{prefix}1.ckpt", multimodal=False)
    assert cfg0.z_dim == 4
    import numpy as np

    l0 = np.asarray(jax.tree_util.tree_leaves(p0)[0])
    l1 = np.asarray(jax.tree_util.tree_leaves(p1)[0])
    assert not np.array_equal(l0, l1)  # independent seeds -> distinct weights
