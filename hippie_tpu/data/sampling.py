"""Class-balanced oversampling (reference: BalancedBatchSampler,
hippie/dataloading.py:107-151) as a deterministic index-stream computation.

Reference semantics, reproduced exactly:
  - bucket indices per label, in order of first appearance in the dataset;
  - oversample every class to the majority count by sampling (with
    replacement) from the indices accumulated so far;
  - yield round-robin across classes: class_0[0], class_1[0], ..., class_0[1]...
  - stream length = balanced_max * num_classes, identical every epoch.

The reference draws oversampling choices from Python's global ``random`` (not
seeded by torch.manual_seed — nondeterministic run to run); we use an explicit
numpy Generator so runs are reproducible.
"""

from __future__ import annotations

import numpy as np


def balanced_indices(labels: np.ndarray, seed: int = 42,
                     target_count: int | None = None) -> np.ndarray:
    """Return the full balanced round-robin index stream for one epoch.

    ``target_count`` (optional) oversamples every class to that count instead
    of the majority count — callers that run several label subsets through
    one compiled program (the fold-parallel kfold refit) pass the global
    majority count so every subset's stream has the same length. Must be >=
    the local majority count; default None keeps the reference semantics.
    """
    labels = np.asarray(labels)
    rng = np.random.default_rng(seed)

    buckets: dict = {}
    for idx, lab in enumerate(labels):
        buckets.setdefault(lab.item() if hasattr(lab, "item") else lab, []).append(idx)
    balanced_max = max(len(b) for b in buckets.values())
    if target_count is not None:
        if target_count < balanced_max:
            raise ValueError(
                f"target_count {target_count} < local majority {balanced_max}")
        balanced_max = target_count

    # random.choice-with-replacement from the growing list, like the reference
    # (dataloading.py:123-125 appends chosen items back into the pool).
    for b in buckets.values():
        while len(b) < balanced_max:
            b.append(b[rng.integers(0, len(b))])

    keys = list(buckets.keys())
    stream = np.empty(balanced_max * len(keys), dtype=np.int64)
    for j in range(balanced_max):
        for c, k in enumerate(keys):
            stream[j * len(keys) + c] = buckets[k][j]
    return stream
