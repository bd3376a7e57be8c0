"""Pipeline integration: full 3-stage runs on tiny synthetic data with a
shallow backbone (num_blocks=(1,1,1,1)) to keep single-core XLA compiles
manageable. Verifies stage wiring, file contracts, and checkpoint round trips.
"""

import os

import numpy as np
import pandas as pd
import pytest

from hippie_tpu.data import synth
from hippie_tpu.data.registry import DATASET_SOURCE_IDS
from hippie_tpu.train.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_datasets")
    # target + two pretraining datasets, reusing known registry names so
    # source-id lookup applies
    synth.make_dataset(str(root), "cellexplorer-celltype", n=48, num_classes=3, seed=0)
    synth.make_dataset(str(root), "extracellular-mouse-a1", n=40, wave_width=39, isi_width=50, seed=1)
    synth.make_dataset(str(root), "neonatal-mouse-brain-slice", n=64, wave_width=49, seed=2)
    return str(root)


def _base_cfg(synth_root, tmp_path, **kw):
    return PipelineConfig(
        z_dim=4,
        dataset="cellexplorer-celltype",
        data_root=synth_root,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpts"),
        batch_size=32,
        supervised_batch_size=16,
        pretrain_max_epochs=1,
        finetune_max_epochs=1,
        supervised_max_epochs=1,
        num_blocks=(1, 1, 1, 1),
        verbose=False,
        **kw,
    )


@pytest.mark.slow
def test_unimodal_pipeline_end_to_end(synth_root, tmp_path):
    cfg = _base_cfg(synth_root, tmp_path)
    results = run_pipeline(cfg)

    # KNN results for all three embedding kinds
    for kind in ("waveform", "isi", "joint"):
        assert 0.0 <= results["best"][kind]["balanced_accuracy"] <= 1.0
        assert results["best"][kind]["k"] in range(5, 20)

    # file contract
    out = cfg.output_dir
    for kind in ("waveform", "isi", "joint"):
        assert os.path.exists(os.path.join(out, f"pretraining_cellexplorer-celltype_{kind}_embeddings.csv"))
        assert os.path.exists(os.path.join(out, f"cellexplorer-celltype_{kind}_knn.csv"))
        assert os.path.exists(os.path.join(out, f"cellexplorer-celltype_{kind}_embeddings.csv"))

    # knn csv schema: pred/true with original label names
    df = pd.read_csv(os.path.join(out, "cellexplorer-celltype_joint_knn.csv"), index_col=0)
    assert list(df.columns) == ["pred", "true"]
    assert set(df["true"]).issubset({"type0", "type1", "type2"})

    # embeddings csv: z columns + label
    df = pd.read_csv(os.path.join(out, "cellexplorer-celltype_waveform_embeddings.csv"), index_col=0)
    assert df.shape == (48, cfg.z_dim + 1)
    assert "label" in df.columns

    # checkpoints are Lightning-compatible and reloadable
    from hippie_tpu.train import checkpoint as ckpt_mod

    payload = ckpt_mod.load_lightning_ckpt(results["checkpoints"]["wave"])
    assert "state_dict" in payload and payload["optimizer_states"]
    assert any(k.startswith("model.encoder.") for k in payload["state_dict"])


@pytest.mark.slow
def test_multimodal_honest_eval_and_drop_index(synth_root, tmp_path, monkeypatch):
    """The opt-in fix flags must act on the multimodal path too: stage 3 loads
    with drop_index_column, and honest_eval removes the class conditioning
    from the exported stage-3 embeddings (training is unaffected, so the two
    runs differ only in the leak)."""
    from hippie_tpu.data import registry

    seen_flags = []
    orig_load_raw = registry.load_raw

    def recording_load_raw(root, name, **kw):
        seen_flags.append(kw.get("drop_index_column", False))
        return orig_load_raw(root, name, **kw)

    monkeypatch.setattr(registry, "load_raw", recording_load_raw)

    leaked_cfg = _base_cfg(
        synth_root, tmp_path / "leaked", model_type="multimodal", drop_index_column=True
    )
    honest_cfg = _base_cfg(
        synth_root, tmp_path / "honest", model_type="multimodal",
        drop_index_column=True, honest_eval=True,
    )
    run_pipeline(leaked_cfg)
    run_pipeline(honest_cfg)

    # every dataset load in the run honored the flag (incl. the stage-3 reload)
    assert seen_flags and all(seen_flags)

    name = "cellexplorer-celltype_joint_embeddings.csv"
    leaked = pd.read_csv(os.path.join(leaked_cfg.output_dir, name), index_col=0)
    honest = pd.read_csv(os.path.join(honest_cfg.output_dir, name), index_col=0)
    assert leaked.shape == honest.shape
    emb_cols = [c for c in leaked.columns if c != "label"]
    assert not np.allclose(leaked[emb_cols].to_numpy(), honest[emb_cols].to_numpy())


@pytest.mark.slow
def test_unimodal_pipeline_data_parallel(synth_root, tmp_path):
    """--dp-devices: the full pipeline runs sharded over the 8-device CPU
    mesh (params replicated, batch plans sharded, GSPMD all-reduce) and
    produces the same artifact contract as the single-device path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest")
    cfg = _base_cfg(synth_root, tmp_path, dp_devices=8)
    results = run_pipeline(cfg)
    for kind in ("waveform", "isi", "joint"):
        assert 0.0 <= results["best"][kind]["balanced_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(cfg.output_dir, "cellexplorer-celltype_joint_knn.csv"))


def test_direct_handoff_bit_identical_to_ckpt_detour(tmp_path):
    """Stage-3 seeding now grafts the tracker's device-resident best trees
    directly (_seed_from_best); this must be BIT-identical to the old detour
    of flush() -> load_lightning_ckpt -> from_torch_state_dict(strict=False,
    drop class_embedding) that mirrors the reference's reload contract
    (train_model.py:333-347, quirk Q10)."""
    import jax
    import jax.numpy as jnp

    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt_mod
    from hippie_tpu.train import loop, optim, pipeline, step

    cfg_m = cvae.CVAEConfig(z_dim=3, output_size=50, class_hidden_dim=5,
                            num_sources=7, num_classes=5, num_blocks=(1, 1, 1, 1))
    key = jax.random.PRNGKey(0)
    params, bn = cvae.unimodal_cvae_init(key, cfg_m)
    # Fake a trained state: perturb every leaf so grafting mistakes can't hide
    params = jax.tree_util.tree_map(lambda x: x + 0.125, params)
    bn = jax.tree_util.tree_map(lambda x: x + 1 if jnp.issubdtype(x.dtype, jnp.integer) else x + 0.25, bn)

    tx = optim.make_optimizer(1e-3, 0.01, None)
    result = loop.FitResult(
        state=step.TrainState(params, bn, tx.init(params)),
        best_params=params, best_bn_state=bn, best_val_loss=0.5,
        best_epoch=0, epochs_run=1, best_opt_state=tx.init(params),
    )
    tracker = pipeline.BestTracker(str(tmp_path / "m.ckpt"))
    template5 = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg_m)
    tracker.update_from_fit(result, template5, (1e-3, 0.01))

    # stage-3 template: DIFFERENT num_classes (fresh class embedding)
    cfg_sup = cvae.CVAEConfig(z_dim=3, output_size=50, class_hidden_dim=5,
                              num_sources=7, num_classes=3, num_blocks=(1, 1, 1, 1))
    template = cvae.unimodal_cvae_init(jax.random.PRNGKey(7), cfg_sup)

    # old detour
    tracker.flush()
    loaded = ckpt_mod.load_lightning_ckpt(tracker.path)
    det_p, det_bn, _, _ = ckpt_mod.from_torch_state_dict(
        loaded["state_dict"], template[0], template[1],
        drop_keys=("class_embedding.weight",),
    )

    # new direct handoff
    dir_p, dir_bn = pipeline._seed_from_best(tracker.best_params, tracker.best_bn, template)

    det_flat = ckpt_mod.flatten_interleaved(det_p, det_bn)
    dir_flat = ckpt_mod.flatten_interleaved(dir_p, dir_bn)
    assert list(det_flat) == list(dir_flat)  # same keys, same insertion order
    for k in det_flat:
        a, b = np.asarray(det_flat[k]), np.asarray(dir_flat[k])
        assert a.dtype == b.dtype and a.shape == b.shape, k
        assert np.array_equal(a, b), f"mismatch at {k}"
    # the fresh class embedding comes from the stage-3 template in both
    assert np.array_equal(
        np.asarray(dir_p["class_embedding"]["weight"]),
        np.asarray(template[0]["class_embedding"]["weight"]),
    )
    # and the graft returns copies — donation-safe w.r.t. the tracker's refs
    assert dir_p["z_mean"]["weight"] is not tracker.best_params["z_mean"]["weight"]


@pytest.mark.slow
def test_unimodal_pipeline_fsdp(synth_root, tmp_path):
    """--fsdp: params + optimizer state sharded per-leaf over the 8-device
    mesh (ZeRO-style), data replicated, plans batch-sharded; same artifact
    contract as the replicated dp path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest")
    cfg = _base_cfg(synth_root, tmp_path, dp_devices=8, fsdp=True)
    results = run_pipeline(cfg)
    for kind in ("waveform", "isi", "joint"):
        assert 0.0 <= results["best"][kind]["balanced_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(cfg.output_dir, "cellexplorer-celltype_joint_knn.csv"))


def test_fsdp_requires_mesh(synth_root, tmp_path):
    cfg = _base_cfg(synth_root, tmp_path, fsdp=True)  # no dp_devices
    with pytest.raises(ValueError, match="fsdp"):
        run_pipeline(cfg)


@pytest.mark.slow
def test_multimodal_pipeline_data_parallel(synth_root, tmp_path):
    """--dp-devices with --model-type multimodal: the joint model's full
    3-stage pipeline (incl. the balanced supervised stage) runs sharded over
    the 8-device CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest")
    cfg = _base_cfg(synth_root, tmp_path, model_type="multimodal", dp_devices=8)
    results = run_pipeline(cfg)
    assert "joint" in results["best"]
    assert 0.0 <= results["best"]["joint"]["balanced_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(cfg.output_dir, "cellexplorer-celltype_joint_knn.csv"))


@pytest.mark.slow
def test_multimodal_pipeline_end_to_end(synth_root, tmp_path):
    cfg = _base_cfg(synth_root, tmp_path, model_type="multimodal")
    results = run_pipeline(cfg)
    assert "joint" in results["best"]
    out = cfg.output_dir
    assert os.path.exists(os.path.join(out, "pretraining_cellexplorer-celltype_joint_embeddings.csv"))
    assert os.path.exists(os.path.join(out, "cellexplorer-celltype_joint_knn.csv"))
    assert os.path.exists(os.path.join(out, "cellexplorer-celltype_joint_embeddings.csv"))
    cm = results["best"]["joint"]["confusion_matrix"]
    assert cm.sum() == len(results["label_val"])


def test_multimodal_pipeline_zero_epochs(synth_root, tmp_path):
    """max_epochs=0 everywhere: every stage handoff must fall back to the
    last (initial) state instead of a None tracker snapshot — the stage-2
    multimodal handoff used to crash embedding with params=None."""
    import dataclasses

    cfg = dataclasses.replace(
        _base_cfg(synth_root, tmp_path, model_type="multimodal"),
        pretrain_max_epochs=0, finetune_max_epochs=0, supervised_max_epochs=0,
    )
    results = run_pipeline(cfg)
    assert "joint" in results["best"]
    assert os.path.exists(os.path.join(
        cfg.output_dir, "cellexplorer-celltype_joint_embeddings.csv"))


@pytest.mark.slow
def test_pipeline_with_discovered_custom_dataset(tmp_path):
    """--discover-datasets: a custom dataset dir (not in the reference
    registry) becomes a first-class target — registry.json-pinned source ID,
    pretraining pool assembled leave-target-out, full 3-stage pipeline + KNN
    eval. Shapes mirror test_unimodal_pipeline_end_to_end exactly (and the
    pin reuses cellexplorer's source ID) so every program is jit-warm —
    fresh compiles on the 1-core host would cost minutes."""
    import json

    from hippie_tpu.data import registry

    saved_ids = dict(DATASET_SOURCE_IDS)
    saved_n = registry.NUM_SOURCES
    root = tmp_path / "data"
    synth.make_dataset(str(root), "my-lab-rig", n=48, num_classes=3, seed=0)
    synth.make_dataset(str(root), "extracellular-mouse-a1", n=40, wave_width=39, isi_width=50, seed=1)
    synth.make_dataset(str(root), "neonatal-mouse-brain-slice", n=64, wave_width=49, seed=2)
    (root / "registry.json").write_text(json.dumps({"my-lab-rig": 3}))
    try:
        cfg = PipelineConfig(
            z_dim=4,
            dataset="my-lab-rig",
            data_root=str(root),
            output_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpts"),
            batch_size=32,
            supervised_batch_size=16,
            pretrain_max_epochs=1,
            finetune_max_epochs=1,
            supervised_max_epochs=1,
            num_blocks=(1, 1, 1, 1),
            verbose=False,
            discover_datasets=True,
        )
        results = run_pipeline(cfg)
        assert DATASET_SOURCE_IDS["my-lab-rig"] == 3  # registry.json pin
        assert registry.NUM_SOURCES == saved_n
        for kind in ("waveform", "isi", "joint"):
            assert 0.0 <= results["best"][kind]["balanced_accuracy"] <= 1.0
        assert os.path.exists(os.path.join(cfg.output_dir, "my-lab-rig_joint_knn.csv"))
        assert os.path.exists(os.path.join(cfg.output_dir, "my-lab-rig_waveform_embeddings.csv"))
    finally:
        DATASET_SOURCE_IDS.clear()
        DATASET_SOURCE_IDS.update(saved_ids)
        registry.NUM_SOURCES = saved_n
