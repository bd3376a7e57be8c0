"""Synthetic dataset generation in the reference's on-disk CSV contract.

Two uses:
  - benchmarking Neuropixels-scale configs (allenscope-neuropixel's waveform/
    isi blobs are absent from the reference snapshot, and openscope-glo was
    never shipped — SURVEY.md §2.5); `make_dataset` produces drop-in stand-ins
    at any scale;
  - fast pipeline integration tests on tiny data.

Waveforms are class-dependent damped-oscillation templates plus noise; ISI
histograms are class-dependent log-normal-ish counts — structured enough that
embeddings carry class signal.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def make_dataset(
    root: str,
    name: str,
    *,
    n: int = 256,
    wave_width: int = 46,
    isi_width: int = 100,
    num_classes: int = 3,
    seed: int = 0,
    label_column: str = "label",
    with_metadata: bool = False,
) -> str:
    """Write datasets/<name>/{waveforms,isi_dist,labels}.csv; returns the dir.

    CSVs are written the way the reference pipeline writes/reads them: pandas
    with an index column (which the loaders then re-ingest as feature 0,
    quirk Q4).
    """
    rng = np.random.default_rng(seed)
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)

    classes = rng.integers(0, num_classes, size=n)
    t = np.linspace(0, 1, wave_width)

    waves = np.empty((n, wave_width), np.float64)
    isis = np.empty((n, isi_width), np.float64)
    for i in range(n):
        c = classes[i]
        freq = 3.0 + 2.0 * c
        decay = 2.0 + 0.5 * c
        wave = -np.exp(-decay * t) * np.sin(2 * np.pi * freq * t)
        waves[i] = wave + 0.05 * rng.normal(size=wave_width)
        mu = 1.0 + 0.6 * c
        samples = rng.lognormal(mean=mu, sigma=0.6, size=400)
        hist, _ = np.histogram(samples, bins=isi_width, range=(0, 30))
        isis[i] = hist

    pd.DataFrame(waves).to_csv(os.path.join(path, "waveforms.csv"))
    pd.DataFrame(isis).to_csv(os.path.join(path, "isi_dist.csv"))
    labels = pd.DataFrame({label_column: [f"type{c}" for c in classes]})
    labels.to_csv(os.path.join(path, "labels.csv"))
    if with_metadata:
        meta = pd.DataFrame(
            {
                "label": classes,
                "datetime": pd.date_range("2024-01-01", periods=n, freq="s").astype(str),
            }
        )
        meta.to_csv(os.path.join(path, "metadata.csv"), index=False)
    return path
