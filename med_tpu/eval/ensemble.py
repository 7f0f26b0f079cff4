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


def reconcile_nd(dump_binary: Dict, dump_multiclass: Dict) -> Dict:
    """Align a ``delete_ND=False`` binary run's dump onto a ``delete_ND=True``
    multiclass run's window/frame set (reference ensemble.ipynb cell 15
    "Pre i-iv": load ``mask_position_ND_<trial>.pth``, expand over the
    subject's positions, drop those rows from the binary preds/labels before
    fusing).

    The reference records the dropped positions in side-channel ``.pth``
    files at preprocessing time; here the drop mask is *recomputed* from the
    binary dump's own raw 5-col labels via the same powerset rule
    (``powerset_error_labels(..., delete_ND=True)``,
    dataset_utils.py:761-845) — the mask marks exactly the rows whose only
    error is Needle-Drop, which are the rows the multiclass run's loader
    deleted. Returns a new binary dump filtered to the surviving rows; the
    caller re-checks alignment afterwards.
    """
    from ..data.labels import powerset_error_labels

    raw = dump_binary.get("raw_labels")
    if raw is None:
        raise ValueError(
            "cannot reconcile ND-dropped runs: the binary dump carries no "
            "raw_labels to recompute the Needle-Drop mask from"
        )
    raw = np.asarray(raw)
    _, nd_mask = powerset_error_labels(raw, delete_ND=True)
    keep = ~nd_mask
    n_mc = len(np.asarray(dump_multiclass["preds"]))
    if int(keep.sum()) != n_mc:
        raise ValueError(
            f"ND reconciliation failed: binary run keeps {int(keep.sum())} "
            f"rows after dropping Needle-Drop-only rows but the multiclass "
            f"run has {n_mc}"
        )
    out = dict(dump_binary)
    for key in ("preds", "probs", "labels", "raw_labels", "gestures",
                "subjects"):
        v = dump_binary.get(key)
        if v is not None and len(v) == len(keep):
            out[key] = np.asarray(v)[keep]
    return out


def score_predictions(
    labels: np.ndarray, preds: np.ndarray, n_classes: int, average: str
) -> Tuple[Dict[str, float], np.ndarray]:
    y = np.asarray(labels).astype(int).reshape(-1)
    p = np.asarray(preds).astype(int).reshape(-1)
    cm = np.zeros((n_classes, n_classes), np.int64)
    for yi, pi in zip(y, p):
        cm[yi, pi] += 1
    return metrics_from_cm(cm, average), cm
