"""Multi-model ensembling over stored run artifacts (reference
ensemble.ipynb): soft vote of two binary runs' probabilities (cell 6) and
the binary -> multiclass cascade (cell 15), scored per fold with weighted
mean ± std."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config import LOSO_FOLDS
from ..eval.ensemble import (
    cascade_ensemble,
    reconcile_nd,
    score_predictions,
    soft_vote,
)
from ..eval.summary import weighted_mean_std
from ..tracking import RunTracker


def _load_fold_dump(runs_root, run_id, setting, out):
    run_dir = RunTracker.find_run(runs_root, run_id)
    with open(os.path.join(run_dir, "artifacts",
                           f"best_model_{setting}_{out}.json")) as f:
        return json.load(f)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs-root", default="runs")
    p.add_argument("--setting", default="LOSO")
    p.add_argument("--folds", default=",".join(LOSO_FOLDS))
    p.add_argument("--mode", choices=["soft_vote", "cascade"], required=True)
    p.add_argument("--run-a", required=True,
                   help="binary run (video model / binary stage)")
    p.add_argument("--run-b", required=True,
                   help="binary run (kinematics model) or multiclass run")
    args = p.parse_args(argv)

    folds = [f for f in args.folds.split(",") if f]
    dumps_a = {o: _load_fold_dump(args.runs_root, args.run_a, args.setting, o)
               for o in folds}
    dumps_b = {o: _load_fold_dump(args.runs_root, args.run_b, args.setting, o)
               for o in folds}
    from ..eval.results import check_run_alignment, prediction_overlap

    if args.mode == "soft_vote":
        check_run_alignment(dumps_a, dumps_b)
        ov = prediction_overlap(dumps_a, dumps_b)
        print(f"overlap: both={ov['both_correct']:.3f} "
              f"one={ov['exactly_one_correct']:.3f} "
              f"neither={ov['both_wrong']:.3f}")
    else:
        # cascade: a delete_ND=False binary run is longer than a
        # delete_ND=True multiclass run — reconcile onto the multiclass
        # window set (reference ensemble.ipynb cell 15 mask surgery)
        for out in folds:
            na = len(np.asarray(dumps_a[out]["preds"]))
            nb = len(np.asarray(dumps_b[out]["preds"]))
            if na != nb:
                dumps_a[out] = reconcile_nd(dumps_a[out], dumps_b[out])
                print(f"[{out}] reconciled ND rows: binary {na} -> "
                      f"{len(np.asarray(dumps_a[out]['preds']))}")

    f1s, accs, jacs, weights = [], [], [], []
    mc_f1s, mc_accs, mc_jacs = [], [], []
    for out in folds:
        da = dumps_a[out]
        db = dumps_b[out]
        labels_a = np.asarray(da["labels"])
        if args.mode == "soft_vote":
            preds, _ = soft_vote(np.asarray(da["probs"]), np.asarray(db["probs"]))
            m, _ = score_predictions(labels_a, preds, 2, "binary")
        else:
            labels_mc = np.asarray(db["labels"])
            casc = cascade_ensemble(np.asarray(da["preds"]), np.asarray(db["preds"]))
            # binary metric vs the binary run's own (reconciled) labels
            # (reference cell 15 scores vs test_all_labels_specific_binary)
            y_bin = labels_a if len(labels_a) == len(casc) else (
                labels_mc > 0).astype(int)
            bin_m, _ = score_predictions(
                y_bin, (casc > 0).astype(int), 2, "binary"
            )
            mc_m, _ = score_predictions(labels_mc, casc, 6, "weighted")
            m = bin_m
            mc_f1s.append(mc_m["f1"]); mc_accs.append(mc_m["accuracy"])
            mc_jacs.append(mc_m["jaccard"])
        f1s.append(m["f1"]); accs.append(m["accuracy"]); jacs.append(m["jaccard"])
        weights.append(len(labels_a))
        print(f"[{out}] f1={m['f1']:.3f} acc={m['accuracy']:.3f}")

    for name, vals in [("F1", f1s), ("Accuracy", accs), ("Jaccard", jacs)]:
        mu, sd = weighted_mean_std(vals, weights)
        print(f"{args.mode} binary {name}: {mu:.3f} ± {sd:.3f}")
    if args.mode == "cascade":
        for name, vals in [("F1", mc_f1s), ("Accuracy", mc_accs),
                           ("Jaccard", mc_jacs)]:
            mu, sd = weighted_mean_std(vals, weights)
            print(f"cascade multiclass {name}: {mu:.3f} ± {sd:.3f}")


if __name__ == "__main__":
    main()
