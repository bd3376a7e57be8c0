"""Data layer: registry contracts, balanced sampler semantics, batch plans."""

import numpy as np
import jax
import pytest

from hippie_tpu.data import device_data, registry, sampling


def test_source_id_map_matches_reference():
    # train_model.py:51-62
    assert registry.DATASET_SOURCE_IDS["extracellular-mouse-a1"] == 1
    assert registry.DATASET_SOURCE_IDS["allenscope-neuropixel"] == 3
    assert registry.NUM_SOURCES == 5


def test_pretrain_pool_leakage_guards():
    # exact-match removal + cellexplorer guard (train_model.py:74-79)
    pool = registry.pretrain_pool("cellexplorer-celltype")
    assert "cellexplorer-celltype" not in pool
    assert "cellexplorer-area" not in pool
    # quirk Q2: the typo'd juxtacellular guard never fires in the reference
    pool = registry.pretrain_pool("juxtacellular-mouse-s1-celltype")
    assert "juxtacellular-mouse-s1-area" in pool
    assert "juxtacellular-mouse-s1-celltype" not in pool
    # fixed behavior behind the flag
    pool = registry.pretrain_pool("juxtacellular-mouse-s1-celltype", strict_leakage_guard=True)
    assert "juxtacellular-mouse-s1-area" not in pool


def test_load_raw_keeps_index_column():
    # quirk Q4: the CSV index column is ingested as feature 0
    wf, isi = registry.load_raw("/root/reference/datasets", "cellexplorer-celltype")
    assert wf.shape == (392, 47)  # 46 samples + index col (SURVEY.md §2.5)
    assert isi.shape == (392, 100)
    np.testing.assert_allclose(wf[:5, 0], np.arange(5))  # index col present


def test_label_encoder_matches_sklearn():
    from sklearn.preprocessing import LabelEncoder as SkLE

    raw = np.array(["PV", "SST", "PV", "VIP", "SST", "PV"])
    ours = registry.LabelEncoder.fit(raw)
    sk = SkLE().fit(raw)
    np.testing.assert_array_equal(ours.classes_, sk.classes_)
    np.testing.assert_array_equal(ours.transform(raw), sk.transform(raw))
    np.testing.assert_array_equal(ours.inverse_transform([0, 1, 2]), sk.inverse_transform([0, 1, 2]))


def test_load_supervised_labels_fallback():
    # quirk Q5: shipped labels.csv files have no 'label' column; we fall back
    # to the last data column instead of crashing like the reference.
    labels, le = registry.load_supervised_labels("/root/reference/datasets", "cellexplorer-celltype")
    assert labels.shape == (392,)
    assert len(le.classes_) > 1


def test_balanced_indices_semantics():
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 2])
    stream = sampling.balanced_indices(labels, seed=0)
    # length = balanced_max * num_classes (dataloading.py:150-151)
    assert len(stream) == 5 * 3
    # round-robin across classes in first-appearance order
    got_labels = labels[stream]
    np.testing.assert_array_equal(got_labels[:3], [0, 1, 2])
    np.testing.assert_array_equal(got_labels, np.tile([0, 1, 2], 5))
    # every class index appears; originals all covered for majority class
    assert set(stream[got_labels == 0]) == {0, 1, 2, 3, 4}
    # oversampled classes only reuse their own indices
    assert set(stream[got_labels == 1]) <= {5, 6}
    assert set(stream[got_labels == 2]) == {7}


def test_batch_plan_padding():
    idx, mask = device_data.batch_plan(np.arange(10), 4, shuffle=False)
    assert idx.shape == (3, 4)
    np.testing.assert_array_equal(mask[-1], [1, 1, 0, 0])
    np.testing.assert_array_equal(idx[0], [0, 1, 2, 3])
    # pads duplicate the tail batch's last real sample: an in-batch copy
    # stays bounded through masked BN even when the tail has 1 real row
    np.testing.assert_array_equal(idx[-1], [8, 9, 9, 9])


def test_batch_plan_shuffle_deterministic():
    k = jax.random.PRNGKey(0)
    a = device_data.batch_plan(np.arange(100), 16, shuffle=True, key=k)
    b = device_data.batch_plan(np.arange(100), 16, shuffle=True, key=k)
    np.testing.assert_array_equal(a[0], b[0])
    c = device_data.batch_plan(np.arange(100), 16, shuffle=True, key=jax.random.PRNGKey(1))
    assert not np.array_equal(a[0], c[0])
    # a shuffle is a permutation
    assert sorted(a[0].reshape(-1)[a[1].reshape(-1) > 0].tolist()) == list(range(100))


def test_train_val_split():
    tr, va = device_data.train_val_split(100, 0.8, jax.random.PRNGKey(0))
    assert len(tr) == 80 and len(va) == 20
    assert sorted(np.concatenate([tr, va]).tolist()) == list(range(100))


def test_chip_finetune_split():
    import pandas as pd

    from hippie_tpu.data import registry

    meta = pd.DataFrame({
        "datetime": [f"2024-01-01 00:00:{s:02d}" for s in range(15)],
    })
    tr, te = registry.chip_finetune_split(meta)
    # earliest 10 unique timestamps -> train (train_model.py:182-188)
    assert sorted(tr.tolist()) == list(range(10))
    assert sorted(te.tolist()) == list(range(10, 15))


def test_synth_dataset_contract(tmp_path):
    from hippie_tpu.data import registry, synth

    synth.make_dataset(str(tmp_path), "demo", n=20, wave_width=33, isi_width=40, seed=0)
    wf, isi = registry.load_raw(str(tmp_path), "demo")
    assert wf.shape == (20, 34)  # +1 index column, quirk Q4
    assert isi.shape == (20, 41)
    labels, le = registry.load_supervised_labels(str(tmp_path), "demo")
    assert labels.shape == (20,)


def test_drop_index_column():
    wf, isi = registry.load_raw("/root/reference/datasets", "cellexplorer-celltype",
                                drop_index_column=True)
    assert wf.shape == (392, 46)  # index column removed
    assert isi.shape == (392, 99)
    assert wf[0, 0] != 0.0 or wf[1, 0] != 1.0  # no longer the row index


def test_shape_bucketing_helpers():
    """next_pow2 / pad_rows / pad_plan: the compile-sharing bucket contract."""
    import numpy as np
    import jax.numpy as jnp
    from hippie_tpu.data import device_data as dd

    assert dd.next_pow2(1) == 64  # default minimum
    assert dd.next_pow2(64) == 64
    assert dd.next_pow2(65) == 128
    assert dd.next_pow2(392) == 512
    assert dd.next_pow2(1, minimum=1) == 1
    assert dd.next_pow2(3, minimum=1) == 4

    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    xp = dd.pad_rows(x, 8)
    assert xp.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(xp[:3]), np.asarray(x))
    assert float(jnp.sum(jnp.abs(xp[3:]))) == 0.0
    assert dd.pad_rows(x, 3) is x  # no-op when already big enough

    idx, mask = dd.batch_plan(np.arange(10), 4, shuffle=False)
    idx_p, mask_p, nb = dd.pad_plan(idx, mask, 8)
    assert idx_p.shape == (8, 4) and mask_p.shape == (8, 4)
    assert nb == idx.shape[0]
    np.testing.assert_array_equal(idx_p[:nb], idx)
    assert mask_p[nb:].sum() == 0  # padded batches fully masked


def test_bucketed_epoch_matches_exact_plan():
    """The bucketed (fori_loop + n_batches) epoch must produce the same final
    state and the same mean loss as the exact scan plan."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hippie_tpu.data import device_data as dd
    from hippie_tpu.models import cvae
    from hippie_tpu.train import optim, step

    rng = np.random.default_rng(0)
    n, B = 40, 16
    data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1e-3, 0.01)
    train_epoch, eval_epoch = step.make_unimodal_epoch_fns(tx, beta=1.0)
    idx, mask = dd.batch_plan(np.arange(n), B, shuffle=False)
    key = jax.random.PRNGKey(1)

    ts1 = step.TrainState(params, bn, tx.init(params))
    ts1, ms_exact = train_epoch(
        ts1, data, source, source, jnp.asarray(idx), jnp.asarray(mask), key
    )

    idx_p, mask_p, nb = dd.pad_plan(idx, mask, 8)
    params2, bn2 = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    ts2 = step.TrainState(params2, bn2, tx.init(params2))
    ts2, ms_bucket = train_epoch(
        ts2, data, source, source, jnp.asarray(idx_p), jnp.asarray(mask_p),
        key, jnp.asarray(nb, jnp.int32),
    )

    np.testing.assert_allclose(
        float(jnp.mean(ms_exact.loss)), float(ms_bucket.loss), rtol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params), jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_register_and_discover_custom_datasets(tmp_path):
    """registry.discover_datasets: contract-following dirs get fresh source
    IDs (registry.json pins take precedence), idempotent, pool membership."""
    import json

    import pytest

    from hippie_tpu.data import synth

    saved_ids = dict(registry.DATASET_SOURCE_IDS)
    saved_n = registry.NUM_SOURCES
    root = str(tmp_path)
    synth.make_dataset(root, "zz-custom-b", n=8, seed=0)
    synth.make_dataset(root, "aa-custom-a", n=8, seed=1)
    (tmp_path / "not-a-dataset").mkdir()  # no CSVs: ignored
    (tmp_path / "registry.json").write_text(json.dumps({"zz-custom-b": 9}))
    try:
        new = registry.discover_datasets(root)
        assert new == ["aa-custom-a", "zz-custom-b"]
        assert registry.DATASET_SOURCE_IDS["zz-custom-b"] == 9  # pinned
        assert registry.DATASET_SOURCE_IDS["aa-custom-a"] == 10  # next free
        assert registry.NUM_SOURCES == 11
        assert "not-a-dataset" not in registry.DATASET_SOURCE_IDS

        assert registry.discover_datasets(root) == []  # idempotent

        # Fresh assignments are persisted to registry.json, so a FRESH
        # process discovering MORE directories later never remaps the IDs
        # this one trained against.
        pins = json.loads((tmp_path / "registry.json").read_text())
        assert pins == {"zz-custom-b": 9, "aa-custom-a": 10}
        registry.DATASET_SOURCE_IDS.clear()
        registry.DATASET_SOURCE_IDS.update(saved_ids)  # simulate new process
        registry.NUM_SOURCES = saved_n
        synth.make_dataset(root, "ab-custom-c", n=8, seed=2)  # sorts before b
        assert registry.discover_datasets(root) == [
            "aa-custom-a", "ab-custom-c", "zz-custom-b"]
        assert registry.DATASET_SOURCE_IDS["aa-custom-a"] == 10  # unchanged
        assert registry.DATASET_SOURCE_IDS["ab-custom-c"] == 11  # next free

        pool = registry.pretrain_pool("aa-custom-a")
        assert "zz-custom-b" in pool and "aa-custom-a" not in pool
        assert "cellexplorer-celltype" in pool

        with pytest.raises(ValueError):
            registry.register_dataset("zz-custom-b", source_id=3)  # conflict
        assert registry.register_dataset("zz-custom-b") == 9  # no-op re-reg

        # A pin whose directory is ABSENT still reserves its ID: a fresh
        # unpinned dataset must not be assigned the same source id (the two
        # would silently share one source embedding).
        registry.DATASET_SOURCE_IDS.clear()
        registry.DATASET_SOURCE_IDS.update(saved_ids)
        registry.NUM_SOURCES = saved_n
        (tmp_path / "registry.json").write_text(
            json.dumps({"absent-elsewhere": 12}))
        new = registry.discover_datasets(root)
        assert "absent-elsewhere" in new
        assert registry.DATASET_SOURCE_IDS["absent-elsewhere"] == 12
        assert registry.DATASET_SOURCE_IDS["aa-custom-a"] == 13  # not 12
        assert registry.NUM_SOURCES == 16  # aa/ab/zz assigned 13/14/15
    finally:
        registry.DATASET_SOURCE_IDS.clear()
        registry.DATASET_SOURCE_IDS.update(saved_ids)
        registry.NUM_SOURCES = saved_n


def test_balanced_indices_target_count():
    """target_count oversamples every class to the given count (equal-length
    streams across label subsets — the fold-parallel kfold contract); default
    None keeps the majority-count semantics; too-small targets raise."""
    import numpy as np
    import pytest

    from hippie_tpu.data.sampling import balanced_indices

    labels = np.array([0, 0, 0, 0, 1, 1, 2])
    base = balanced_indices(labels, seed=1)
    assert len(base) == 4 * 3
    ext = balanced_indices(labels, seed=1, target_count=6)
    assert len(ext) == 6 * 3
    # round-robin: stream positions j*3..j*3+2 hold one index per class
    assert [labels[i] for i in ext[:3]] == [0, 1, 2]
    with pytest.raises(ValueError):
        balanced_indices(labels, seed=1, target_count=3)
