"""Dataset registry and CSV ingestion (the reference's on-disk data contract).

Layout contract (SURVEY.md §2.5):
  <data_root>/<name>/{waveforms,isi_dist,labels}.csv  (+optional metadata.csv)

All reference loads use bare ``pd.read_csv`` (train_model.py:80-81), which
ingests the pandas index column as feature 0 (quirk Q4) — we reproduce that
bit-exactly by loading the same way. ``dropna(axis=1)`` is applied on the
fine-tune/inference path only (train_model.py:166-169), mirroring quirk Q13.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

# Source-ID map (train_model.py:51-59). allenscope shares ID 3 with
# cellexplorer; ID 0 is reserved for the inference-time dummy source.
DATASET_SOURCE_IDS: Dict[str, int] = {
    "extracellular-mouse-a1": 1,
    "cellexplorer-celltype": 3,
    "cellexplorer-area": 3,
    "juxtacellular-mouse-s1-celltype": 4,
    "juxtacellular-mouse-s1-area": 4,
    "allenscope-neuropixel": 3,
    "neonatal-mouse-brain-slice": 2,
}

NUM_SOURCES = max(DATASET_SOURCE_IDS.values()) + 1  # train_model.py:62


def register_dataset(name: str, source_id: Optional[int] = None) -> int:
    """Register a custom dataset name with the registry.

    ``source_id`` defaults to the next free ID; sharing an existing ID makes
    the dataset share that source embedding (like the cellexplorer pair).
    Re-registering an existing name is a no-op when the IDs agree and an
    error when they conflict. Updates ``NUM_SOURCES`` (the source-embedding
    table size for subsequently-built models).
    """
    global NUM_SOURCES
    prior = DATASET_SOURCE_IDS.get(name)
    if prior is not None:
        if source_id is not None and int(source_id) != prior:
            raise ValueError(
                f"dataset {name!r} already registered with source_id {prior}; "
                f"got conflicting source_id {source_id}"
            )
        return prior
    sid = NUM_SOURCES if source_id is None else int(source_id)
    if sid < 0:
        raise ValueError(f"source_id must be >= 0, got {sid}")
    DATASET_SOURCE_IDS[name] = sid
    NUM_SOURCES = max(NUM_SOURCES, sid + 1)
    return sid


def discover_datasets(data_root: str) -> list:
    """Scan ``data_root`` for dataset directories and register unknown ones.

    A dataset directory is any subdirectory containing both ``waveforms.csv``
    and ``isi_dist.csv`` (the reference's on-disk contract, SURVEY.md §2.5).
    Reference names keep their reference source IDs; new names get fresh
    sequential IDs in sorted-name order. An optional
    ``<data_root>/registry.json`` mapping ``{name: source_id}`` pins IDs
    declaratively and takes precedence for those names; every pin reserves
    its ID even when the dataset directory is absent. Every assignment is
    persisted back to ``registry.json``, so IDs are stable across processes
    AND across later additions of new dataset directories (an unpinned
    sorted-order assignment alone would silently remap already-trained
    datasets when an alphabetically-earlier directory appears). Idempotent.

    Returns the newly registered names (sorted).
    """
    import json

    pinned = {}
    manifest = os.path.join(data_root, "registry.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            raw = json.load(f)
        if not isinstance(raw, dict):
            raise ValueError(f"{manifest} must be a JSON object of name -> source_id")
        pinned = {str(k): int(v) for k, v in raw.items()}

    # EVERY pin reserves its ID, present directory or not: a pin for an
    # absent dataset (other machine, unmounted data) must still block fresh
    # sequential assignment from colliding with it — two datasets silently
    # sharing a source embedding would defeat the manifest's stability
    # guarantee. Registered-but-absent names are harmless downstream (the
    # pretrain pool loader skips missing directories).
    new = []
    for name in sorted(pinned):
        if name not in DATASET_SOURCE_IDS:
            new.append(name)
        register_dataset(name, pinned[name])

    found = []
    if os.path.isdir(data_root):
        for entry in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, entry)
            if (os.path.isdir(d)
                    and os.path.exists(os.path.join(d, "waveforms.csv"))
                    and os.path.exists(os.path.join(d, "isi_dist.csv"))
                    and entry not in DATASET_SOURCE_IDS):
                found.append(entry)

    for name in sorted(found):
        register_dataset(name, None)
        new.append(name)

    # Persist fresh assignments so a later discovery (with more directories
    # present) can never remap the IDs this process trained against.
    unpersisted = [n for n in found if n not in pinned]
    if unpersisted:
        merged = dict(pinned)
        merged.update({n: DATASET_SOURCE_IDS[n] for n in unpersisted})
        try:
            tmp = f"{manifest}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(merged, f, indent=1, sort_keys=True)
            os.replace(tmp, manifest)
        except OSError as e:  # read-only data root: IDs live for this process only
            import warnings

            warnings.warn(
                f"could not persist dataset source IDs to {manifest} ({e}); "
                f"pin them manually to keep checkpoints portable"
            )
    return sorted(new)


def pretrain_pool(target_dataset: str, *, strict_leakage_guard: bool = False):
    """Names of datasets used for pretraining a given target (leave-target-out).

    Reference behavior (train_model.py:70-79): exact-match removal always; the
    cellexplorer guard removes both cellexplorer datasets; the juxtacellular
    guard is typo'd ("justacellular", quirk Q2) and never fires. Pass
    ``strict_leakage_guard=True`` for the fixed behavior that also removes
    sister juxtacellular datasets.
    """
    pool = dict(DATASET_SOURCE_IDS)
    if "cellexplorer" in target_dataset:
        pool.pop("cellexplorer-celltype", None)
        pool.pop("cellexplorer-area", None)
    if strict_leakage_guard and "juxtacellular" in target_dataset:
        pool.pop("juxtacellular-mouse-s1-celltype", None)
        pool.pop("juxtacellular-mouse-s1-area", None)
    return [name for name in pool if name != target_dataset]


def load_raw(
    data_root: str,
    name: str,
    *,
    dropna: bool = False,
    drop_index_column: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load (waveforms, isi) raw arrays exactly as the reference does.

    Keeps the CSV index column as feature 0 (quirk Q4) unless
    ``drop_index_column`` opts out (the reference always ingests it; dropping
    it improves actual signal quality but breaks numerical compatibility).
    Uses the native C parser (hippie_tpu/data/fastcsv.py) with transparent
    pandas fallback; ``dropna`` reproduces the fine-tune path's
    ``dropna(axis=1)`` (train_model.py:166-169, quirk Q13) by dropping
    any-NaN columns.
    """
    from hippie_tpu.data import fastcsv

    wf = fastcsv.read_numeric_csv(os.path.join(data_root, name, "waveforms.csv"))
    isi = fastcsv.read_numeric_csv(os.path.join(data_root, name, "isi_dist.csv"))
    if drop_index_column:
        wf, isi = wf[:, 1:], isi[:, 1:]
    if dropna:
        wf = wf[:, ~np.isnan(wf).any(axis=0)]
        isi = isi[:, ~np.isnan(isi).any(axis=0)]
    return np.ascontiguousarray(wf), np.ascontiguousarray(isi)


@dataclass
class LabelEncoder:
    """sklearn-compatible label encoder (sorted unique classes -> codes)."""

    classes_: np.ndarray

    @classmethod
    def fit(cls, labels) -> "LabelEncoder":
        return cls(classes_=np.unique(np.asarray(labels)))

    def transform(self, labels) -> np.ndarray:
        idx = np.searchsorted(self.classes_, np.asarray(labels))
        return idx.astype(np.int64)

    def inverse_transform(self, codes) -> np.ndarray:
        return self.classes_[np.asarray(codes, dtype=np.int64)]


def load_supervised_labels(data_root: str, name: str):
    """Labels for the supervised stage (train_model.py:275-283).

    The reference reads ``labels.csv["label"]`` and crashes on every shipped
    dataset because none has a ``label`` column (quirk Q5). We try "label"
    first for contract compatibility, then fall back to the last non-index
    column — the evident intent. Missing file -> all-zero labels, matching the
    reference's else-branch.
    Returns (encoded_labels int64 [N], encoder).
    """
    path = os.path.join(data_root, name, "labels.csv")
    if not os.path.exists(path):
        wf, _ = load_raw(data_root, name)
        labels = np.zeros(len(wf))
        return labels.astype(np.int64), LabelEncoder.fit(labels)
    df = pd.read_csv(path)
    if "label" in df.columns:
        raw = df["label"].values
    else:
        # Fall back to the last column, skipping a pandas index column.
        cols = [c for c in df.columns if not str(c).startswith("Unnamed")]
        raw = df[cols[-1]].values if cols else df[df.columns[-1]].values
    le = LabelEncoder.fit(raw)
    return le.transform(raw), le


def load_metadata(data_root: str, name: str) -> Optional[pd.DataFrame]:
    path = os.path.join(data_root, name, "metadata.csv")
    return pd.read_csv(path) if os.path.exists(path) else None


def chip_finetune_split(metadata: pd.DataFrame):
    """Earliest-10-timestamps rule for chip datasets (train_model.py:182-188)."""
    dt = pd.to_datetime(metadata["datetime"]).dt.time
    first_times = dt.sort_values().unique()[:10]
    train_idx = metadata[dt.isin(first_times)].index.to_numpy()
    test_idx = metadata[~dt.isin(first_times)].index.to_numpy()
    return train_idx, test_idx
