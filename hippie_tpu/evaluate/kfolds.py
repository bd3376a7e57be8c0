"""Stratified k-fold generation (reference: hippie/utils.py:42-70
``generate_kfolds`` — StratifiedKFold(10, shuffle, seed 42); never called by
any shipped script but part of the public utils surface).

``stratified_kfold_indices`` reproduces sklearn's StratifiedKFold(shuffle=True)
semantics: per-class sample order is shuffled, then class members are dealt to
folds so every fold's class distribution matches the population (fold sizes
differ by at most one per class). ``generate_kfolds`` mirrors the reference's
signature, reading a dataset directory and yielding per-fold arrays.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from hippie_tpu.data import registry


def stratified_kfold_indices(labels, n_splits: int = 10, *, shuffle: bool = True, seed: int = 42):
    """Yield (train_idx, val_idx) per fold with per-class balance."""
    labels = np.asarray(labels)
    rng = np.random.default_rng(seed)
    folds: List[List[int]] = [[] for _ in range(n_splits)]
    for cls in np.unique(labels):
        members = np.flatnonzero(labels == cls)
        if shuffle:
            members = members[rng.permutation(len(members))]
        for i, idx in enumerate(members):
            folds[i % n_splits].append(int(idx))
    all_idx = np.arange(len(labels))
    out = []
    for f in folds:
        val = np.sort(np.asarray(f, dtype=np.int64))
        train = np.setdiff1d(all_idx, val)
        out.append((train, val))
    return out


def generate_kfolds(dataset_path: str, data_root: str = "datasets", n_splits: int = 10):
    """Reference-compatible: returns [(wf_train, wf_val, isi_train, isi_val,
    label_train, label_val, label_encoder), ...]."""
    wf, isi = registry.load_raw(data_root, dataset_path)
    labels_path = os.path.join(data_root, dataset_path, "celltypes.csv")
    if os.path.exists(labels_path):
        import pandas as pd

        raw = pd.read_csv(labels_path, index_col=0).to_numpy().reshape(-1)
    else:
        raw, _ = registry.load_supervised_labels(data_root, dataset_path)
    le = registry.LabelEncoder.fit(raw)
    labels = le.transform(raw)
    folds = []
    for train_idx, val_idx in stratified_kfold_indices(labels, n_splits):
        folds.append(
            (wf[train_idx], wf[val_idx], isi[train_idx], isi[val_idx],
             labels[train_idx], labels[val_idx], le)
        )
    return folds
