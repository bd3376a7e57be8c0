"""Stratified k-fold generation semantics."""

import numpy as np

from hippie_tpu.evaluate.kfolds import generate_kfolds, stratified_kfold_indices


def test_stratified_kfold_partition_and_balance():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, size=200)
    folds = stratified_kfold_indices(labels, 10, seed=42)
    assert len(folds) == 10
    all_val = np.concatenate([v for _, v in folds])
    # every sample in exactly one validation fold
    assert sorted(all_val.tolist()) == list(range(200))
    for train, val in folds:
        assert len(train) + len(val) == 200
        assert not set(train) & set(val)
        # per-class counts within +-1 of the ideal fraction
        for c in np.unique(labels):
            total_c = (labels == c).sum()
            got = (labels[val] == c).sum()
            assert abs(got - total_c / 10) <= 1


def test_generate_kfolds_reference_contract():
    folds = generate_kfolds("cellexplorer-celltype", data_root="/root/reference/datasets")
    assert len(folds) == 10
    wf_tr, wf_va, isi_tr, isi_va, lab_tr, lab_va, le = folds[0]
    assert wf_tr.shape[1] == 47 and isi_tr.shape[1] == 100
    assert len(wf_tr) + len(wf_va) == 392
    assert set(np.unique(lab_va)).issubset(set(range(len(le.classes_))))


def test_kfold_eval_cli(tmp_path, capsys):
    """scripts/kfold_eval.py: trained-ckpt k-fold KNN sweep end to end —
    geometry inferred from the ckpts, sentinel padding keeps every fold in
    one compiled program, CSV has mean±std rows per (kind, k)."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=60, num_classes=3, seed=0)
    for name, out_size, seed in (("wave", 50, 0), ("time", 100, 1)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out_size, num_sources=3,
                              num_classes=3, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(seed), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp_path / f"{name}.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--wave-checkpoint", str(tmp_path / "wave.ckpt"),
        "--time-checkpoint", str(tmp_path / "time.ckpt"),
        "--folds", "5", "--output-dir", str(out),
    ])
    stdout = capsys.readouterr().out
    assert "z_dim=4" in stdout and "5 folds" in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["kind"]) == {"waveform", "isi", "joint"}
    assert sorted(df[df["kind"] == "joint"]["k"]) == list(range(5, 20, 2))
    assert ((0.0 <= df["mean_balanced_accuracy"]) & (df["mean_balanced_accuracy"] <= 1.0)).all()
    assert (df["folds"] == 5).all()


def test_kfold_eval_cli_refit_joint(tmp_path, capsys):
    """--refit with --joint-checkpoint: per-fold MultiModalCVAE refits via
    the pipeline's joint stage recipe (the flagship joint model gets honest
    CV numbers, not just leaky embed-once ones)."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=48, num_classes=2, seed=3)
    mcfg = cvae.MultiModalConfig(z_dim=4, output_size_wave=50,
                                 output_size_isi=100, num_sources=3,
                                 num_classes=3, num_blocks=(1, 1, 1, 1))
    p, s = cvae.multimodal_cvae_init(jax.random.PRNGKey(0), mcfg)
    ckpt_mod.save_lightning_ckpt(str(tmp_path / "joint.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--joint-checkpoint", str(tmp_path / "joint.ckpt"),
        "--folds", "3", "--output-dir", str(out),
        "--refit", "--refit-epochs", "2", "--refit-supervised-epochs", "1",
        "--refit-batch-size", "16", "--refit-patience", "0",
        "--aot-dir", "",
    ])
    stdout = capsys.readouterr().out
    assert "refitting per fold" in stdout
    assert "leakage delta" in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["mode"]) == {"embed_once", "refit"}
    # joint-ckpt mode has only the joint kind, in both modes
    assert set(df["kind"]) == {"joint"}
    assert ((0.0 <= df["mean_balanced_accuracy"])
            & (df["mean_balanced_accuracy"] <= 1.0)).all()


def test_kfold_eval_cli_refit(tmp_path, capsys):
    """--refit: per-fold fine-tune(+supervised) on the fold-train rows only,
    held-out rows embedded by a model that never trained on them; CSV gains
    a mode column with embed_once and refit side by side."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=48, num_classes=2, seed=3)
    for name, out_size, seed in (("wave", 50, 0), ("time", 100, 1)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out_size, num_sources=3,
                              num_classes=3, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(seed), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp_path / f"{name}.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--wave-checkpoint", str(tmp_path / "wave.ckpt"),
        "--time-checkpoint", str(tmp_path / "time.ckpt"),
        "--folds", "3", "--output-dir", str(out),
        "--refit", "--refit-epochs", "2", "--refit-supervised-epochs", "1",
        "--refit-batch-size", "16", "--refit-patience", "0",
        "--aot-dir", "",
    ])
    stdout = capsys.readouterr().out
    assert "refitting per fold" in stdout
    assert "leakage delta" in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["mode"]) == {"embed_once", "refit"}
    for mode in ("embed_once", "refit"):
        sub = df[df["mode"] == mode]
        assert set(sub["kind"]) == {"waveform", "isi", "joint"}
        assert ((0.0 <= sub["mean_balanced_accuracy"])
                & (sub["mean_balanced_accuracy"] <= 1.0)).all()


def test_kfold_eval_cli_refit_fold_parallel(tmp_path, capsys):
    """--fold-parallel: all K fold refits run as replicas of one compiled
    program per stage (ensemble.device_fit_replica_plans) — same honest
    protocol, well-formed output, no sequential fallback on equal-shape
    folds."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=48, num_classes=2, seed=3)
    for name, out_size, seed in (("wave", 50, 0), ("time", 100, 1)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out_size, num_sources=3,
                              num_classes=3, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(seed), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp_path / f"{name}.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--wave-checkpoint", str(tmp_path / "wave.ckpt"),
        "--time-checkpoint", str(tmp_path / "time.ckpt"),
        "--folds", "3", "--output-dir", str(out),
        "--refit", "--refit-epochs", "2", "--refit-supervised-epochs", "1",
        "--refit-batch-size", "16", "--refit-patience", "0",
        "--fold-parallel", "--aot-dir", "",
    ])
    stdout = capsys.readouterr().out
    assert "leakage delta" in stdout
    assert "falling back to sequential" not in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["mode"]) == {"embed_once", "refit"}
    for mode in ("embed_once", "refit"):
        sub = df[df["mode"] == mode]
        assert set(sub["kind"]) == {"waveform", "isi", "joint"}
        assert ((0.0 <= sub["mean_balanced_accuracy"])
                & (sub["mean_balanced_accuracy"] <= 1.0)).all()


def test_kfold_eval_cli_refit_fold_parallel_joint(tmp_path, capsys):
    """--fold-parallel with --joint-checkpoint: per-fold MultiModalCVAE
    refits as one replica-plan program per stage."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=48, num_classes=2, seed=3)
    mcfg = cvae.MultiModalConfig(z_dim=4, output_size_wave=50,
                                 output_size_isi=100, num_sources=3,
                                 num_classes=3, num_blocks=(1, 1, 1, 1))
    p, s = cvae.multimodal_cvae_init(jax.random.PRNGKey(0), mcfg)
    ckpt_mod.save_lightning_ckpt(str(tmp_path / "joint.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--joint-checkpoint", str(tmp_path / "joint.ckpt"),
        "--folds", "3", "--output-dir", str(out),
        "--refit", "--refit-epochs", "2", "--refit-supervised-epochs", "1",
        "--refit-batch-size", "16", "--refit-patience", "0",
        "--fold-parallel", "--aot-dir", "",
    ])
    stdout = capsys.readouterr().out
    assert "leakage delta" in stdout
    assert "falling back to sequential" not in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["mode"]) == {"embed_once", "refit"}
    assert set(df["kind"]) == {"joint"}


def test_kfold_eval_cli_refit_fold_parallel_grouped(tmp_path, capsys):
    """--fold-parallel-max-replicas: folds run in sequential replica groups
    (memory cap for large models); output stays well-formed with no
    sequential fallback."""
    import importlib.util

    import jax
    import pandas as pd

    from hippie_tpu.data import synth
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "data"
    synth.make_dataset(str(root), "kf-rig", n=48, num_classes=2, seed=3)
    for name, out_size, seed in (("wave", 50, 0), ("time", 100, 1)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out_size, num_sources=3,
                              num_classes=3, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(seed), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp_path / f"{name}.ckpt"), p, s)

    spec = importlib.util.spec_from_file_location("kfold_eval", "scripts/kfold_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    mod.main([
        "--dataset", "kf-rig", "--data-root", str(root),
        "--wave-checkpoint", str(tmp_path / "wave.ckpt"),
        "--time-checkpoint", str(tmp_path / "time.ckpt"),
        "--folds", "3", "--output-dir", str(out),
        "--refit", "--refit-epochs", "2", "--refit-supervised-epochs", "1",
        "--refit-batch-size", "16", "--refit-patience", "0",
        "--fold-parallel", "--fold-parallel-max-replicas", "2",
        "--aot-dir", "",
    ])
    stdout = capsys.readouterr().out
    assert "leakage delta" in stdout
    assert "falling back to sequential" not in stdout
    df = pd.read_csv(out / "kf-rig_kfold_knn.csv")
    assert set(df["mode"]) == {"embed_once", "refit"}
