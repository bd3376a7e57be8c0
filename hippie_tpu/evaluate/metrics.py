"""Classification metrics matching sklearn's definitions.

balanced_accuracy_score and confusion_matrix are used by the reference's
evaluation (train_model.py:415-461); exactness vs sklearn is tested in
tests/test_eval.py.
"""

from __future__ import annotations

import numpy as np


def confusion_matrix(y_true, y_pred, labels=None) -> np.ndarray:
    """sklearn-compatible confusion matrix over sorted unique labels."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if labels is None:
        labels = np.unique(np.concatenate([y_true, y_pred]))
    labels = np.asarray(labels)
    index = {l: i for i, l in enumerate(labels.tolist())}
    cm = np.zeros((len(labels), len(labels)), dtype=np.int64)
    for t, p in zip(y_true.tolist(), y_pred.tolist()):
        cm[index[t], index[p]] += 1
    return cm


def balanced_accuracy_score(y_true, y_pred) -> float:
    """Mean per-class recall over classes present in y_true (sklearn semantics)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    classes = np.unique(y_true)
    recalls = []
    for c in classes:
        sel = y_true == c
        recalls.append(np.mean(y_pred[sel] == c))
    return float(np.mean(recalls))
