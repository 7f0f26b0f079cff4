"""On-device streaming classification metrics.

The reference calls sklearn ``f1_score``/``accuracy_score``/``jaccard_score``
/``confusion_matrix`` on host *every batch* (modeling_utils.py:377-381) —
its biggest avoidable device→host sync. Here the train/eval steps accumulate
integer confusion matrices on device (one per batch for train-metric parity,
pooled for eval) and the scalar metrics are derived from the CMs on host once
per epoch. ``metrics_from_cm`` reproduces sklearn's definitions, including
its average-over-present-labels behavior.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    labels: jnp.ndarray,
    preds: jnp.ndarray,
    n_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(C, C) confusion matrix, rows = true class, cols = predicted class.

    Computed as a one-hot contraction so it lowers to a single MXU matmul;
    ``mask`` zeroes out padded examples.
    """
    labels = labels.astype(jnp.int32).reshape(-1)
    preds = preds.astype(jnp.int32).reshape(-1)
    lab_oh = jnp.eye(n_classes, dtype=jnp.float32)[labels]
    pred_oh = jnp.eye(n_classes, dtype=jnp.float32)[preds]
    if mask is not None:
        lab_oh = lab_oh * mask.reshape(-1, 1).astype(jnp.float32)
    return jnp.einsum("nc,nd->cd", lab_oh, pred_oh).astype(jnp.int32)


def metrics_from_cm(cm: np.ndarray, average: str = "binary") -> Dict[str, float]:
    """F1 / accuracy / Jaccard from a confusion matrix.

    ``average``: 'binary' (positive class = 1), 'macro', 'weighted'.
    Matches sklearn: zero-division yields 0; macro/weighted average over
    labels present in y_true or y_pred (sklearn's default label set).
    """
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    acc = float(np.trace(cm) / total) if total else 0.0

    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f1 = np.where(
            precision + recall > 0,
            2 * precision * recall / (precision + recall),
            0.0,
        )
        jaccard = np.where(tp + fp + fn > 0, tp / (tp + fp + fn), 0.0)

    if average == "binary":
        return {"f1": float(f1[1]), "accuracy": acc, "jaccard": float(jaccard[1])}

    support = cm.sum(axis=1)
    present = (support > 0) | (cm.sum(axis=0) > 0)
    if not present.any():
        return {"f1": 0.0, "accuracy": acc, "jaccard": 0.0}
    if average == "macro":
        return {
            "f1": float(f1[present].mean()),
            "accuracy": acc,
            "jaccard": float(jaccard[present].mean()),
        }
    if average == "weighted":
        w = support[present]
        wsum = w.sum()
        if wsum == 0:
            return {"f1": 0.0, "accuracy": acc, "jaccard": 0.0}
        return {
            "f1": float((f1[present] * w).sum() / wsum),
            "accuracy": acc,
            "jaccard": float((jaccard[present] * w).sum() / wsum),
        }
    raise ValueError(f"unknown average {average!r}")


def f1_from_cm(cm: np.ndarray, average: str = "binary") -> float:
    return metrics_from_cm(cm, average)["f1"]


def f1_from_cm_device(cm: jnp.ndarray, average: str = "binary") -> jnp.ndarray:
    """jnp twin of ``f1_from_cm`` for on-device best-checkpoint selection
    (train/fused.py::FusedWindowRun). Same definitions as
    :func:`metrics_from_cm` (sklearn semantics: zero-division -> 0;
    macro/weighted average over labels present in y_true or y_pred).
    ``average`` is static; returns a fp32 scalar."""
    # accumulate counts in int32 (exact to 2^31, vs ~2^24 for fp32) and cast
    # only the final ratios, so device selection agrees with the float64 host
    # metric on large eval folds
    cm = cm.astype(jnp.int32)
    tp_i = jnp.diag(cm)
    fp_i = jnp.sum(cm, axis=0) - tp_i
    fn_i = jnp.sum(cm, axis=1) - tp_i
    tp = tp_i.astype(jnp.float32)
    fp = fp_i.astype(jnp.float32)
    fn = fn_i.astype(jnp.float32)
    precision = jnp.where(tp_i + fp_i > 0, tp / jnp.maximum(tp + fp, 1), 0.0)
    recall = jnp.where(tp_i + fn_i > 0, tp / jnp.maximum(tp + fn, 1), 0.0)
    f1 = jnp.where(
        precision + recall > 0,
        2 * precision * recall / jnp.maximum(precision + recall, 1e-30),
        0.0,
    )
    if average == "binary":
        return f1[1]
    support = jnp.sum(cm, axis=1)
    present = (support > 0) | (jnp.sum(cm, axis=0) > 0)
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    if average == "macro":
        return jnp.sum(jnp.where(present, f1, 0.0)) / n_present
    if average == "weighted":
        w = jnp.where(present, support, 0.0)
        return jnp.sum(f1 * w) / jnp.maximum(jnp.sum(w), 1e-30)
    raise ValueError(f"unknown average {average!r}")
