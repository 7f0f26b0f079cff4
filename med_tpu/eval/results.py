"""Cross-run result analysis (reference notebooks/results.ipynb +
retrieve_results_mlflow*, modeling_utils.py:2377-2692).

Reads best-model artifact dumps from run directories (no tracking server, no
string-position parsing — the reference re-parses MLflow-stringified tensors
by hard-coded character offsets, :2332-2375) and reproduces the analyses:

- per-fold + weighted cross-fold metric tables for any set of runs;
- per-error-type F1 of a binary model (results.ipynb cells 8/12): the binary
  predictions scored against each raw error column;
- majority-class baselines (cells 23-26);
- paired t-tests between configurations (cells 14-22).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import RAW_ERROR_COLUMNS
from ..tracking import RunTracker
from .ensemble import score_predictions
from .summary import weighted_mean_std


def load_run_dumps(
    runs_root: str, run_id: str, setting: str, folds: Sequence[str]
) -> Dict[str, dict]:
    run_dir = RunTracker.find_run(runs_root, run_id)
    out = {}
    for fold in folds:
        with open(os.path.join(run_dir, "artifacts",
                               f"best_model_{setting}_{fold}.json")) as f:
            out[fold] = json.load(f)
    return out


def per_error_type_f1(
    fold_dumps: Dict[str, dict]
) -> Dict[str, Tuple[float, float]]:
    """Binary predictions scored against each raw error column, weighted
    mean ± std across folds (results.ipynb cell 8)."""
    per_col: Dict[str, List[float]] = {c: [] for c in RAW_ERROR_COLUMNS}
    weights = []
    for fold, d in fold_dumps.items():
        raw = np.asarray(d["raw_labels"])
        preds = np.asarray(d["preds"]).astype(int)
        preds_binary = (preds > 0).astype(int)
        weights.append(len(preds))
        for c, name in enumerate(RAW_ERROR_COLUMNS):
            m, _ = score_predictions(raw[:, c], preds_binary, 2, "binary")
            per_col[name].append(m["f1"])
    return {
        name: weighted_mean_std(vals, weights) for name, vals in per_col.items()
    }


def majority_baseline(
    fold_dumps: Dict[str, dict], n_classes: int = 2, average: str = "binary"
) -> Dict[str, Tuple[float, float]]:
    """Always-predict-the-majority-class baseline (results.ipynb cells
    23-26)."""
    f1s, accs, weights = [], [], []
    for fold, d in fold_dumps.items():
        y = np.asarray(d["labels"]).astype(int)
        maj = np.bincount(y, minlength=n_classes).argmax()
        preds = np.full_like(y, maj)
        m, _ = score_predictions(y, preds, n_classes, average)
        f1s.append(m["f1"])
        accs.append(m["accuracy"])
        weights.append(len(y))
    return {"f1": weighted_mean_std(f1s, weights),
            "accuracy": weighted_mean_std(accs, weights)}


def paired_t_test(per_fold_a: Sequence[float], per_fold_b: Sequence[float]):
    """Paired t-test over per-fold metrics (results.ipynb cells 14-22).
    Returns (t statistic, p value)."""
    from scipy import stats

    t, p = stats.ttest_rel(np.asarray(per_fold_a), np.asarray(per_fold_b))
    return float(t), float(p)


def model_comparison_table(
    runs: Dict[str, Tuple[str, str]],
    runs_root: str,
    setting: str,
    folds: Sequence[str],
    average: str = "binary",
    n_classes: int = 2,
) -> Dict[str, Dict[str, str]]:
    """rows: '<model> / <modality>' -> weighted F1/Acc/Jaccard strings,
    recomputed from the stored prediction dumps (results.ipynb cells 1-2)."""
    table = {}
    for label, (run_id, _) in runs.items():
        dumps = load_run_dumps(runs_root, run_id, setting, folds)
        f1s, accs, jacs, weights = [], [], [], []
        for fold, d in dumps.items():
            y = np.asarray(d["labels"]).astype(int)
            p = np.asarray(d["preds"]).astype(int)
            m, _ = score_predictions(y, p, n_classes, average)
            f1s.append(m["f1"]); accs.append(m["accuracy"]); jacs.append(m["jaccard"])
            weights.append(len(y))
        row = {}
        for name, vals in (("F1", f1s), ("Accuracy", accs), ("Jaccard", jacs)):
            mu, sd = weighted_mean_std(vals, weights)
            row[name] = f"{mu:.3f} ± {sd:.3f}"
        table[label] = row
    return table
