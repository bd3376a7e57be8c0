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
