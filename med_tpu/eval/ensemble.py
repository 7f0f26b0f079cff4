"""Multi-model ensembling (reference ensemble.ipynb).

- ``soft_vote``: average the positive-class probabilities of two runs and
  threshold at 0.5 (cell 6: video-CNN + kinematics-CNN).
- ``cascade_ensemble``: a binary model gates a multi-class model — windows
  the binary stage predicts clean are forced to class 0, otherwise the
  multi-class prediction stands (cell 15: binary-COG -> multiclass-COG).

Both are batched on device when arrays are large; at these sizes numpy is
exact and instant, so they run on host over the pooled prediction dumps.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..ops.metrics import metrics_from_cm


def soft_vote(probs_a: np.ndarray, probs_b: np.ndarray, threshold: float = 0.5):
    """(p_a + p_b)/2 >= threshold."""
    p = (np.asarray(probs_a, np.float64) + np.asarray(probs_b, np.float64)) / 2
    return (p >= threshold).astype(np.int64), p


def cascade_ensemble(binary_preds: np.ndarray, multiclass_preds: np.ndarray):
    """binary==1 ? multiclass : 0 (reference ensemble.ipynb cell 15)."""
    b = np.asarray(binary_preds).astype(np.int64)
    m = np.asarray(multiclass_preds).astype(np.int64)
    return np.where(b == 1, m, 0)


def score_predictions(
    labels: np.ndarray, preds: np.ndarray, n_classes: int, average: str
) -> Tuple[Dict[str, float], np.ndarray]:
    y = np.asarray(labels).astype(int).reshape(-1)
    p = np.asarray(preds).astype(int).reshape(-1)
    cm = np.zeros((n_classes, n_classes), np.int64)
    for yi, pi in zip(y, p):
        cm[yi, pi] += 1
    return metrics_from_cm(cm, average), cm
