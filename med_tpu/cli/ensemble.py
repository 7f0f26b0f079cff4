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


def _serve_pixels(args, folds, cfg, mesh):
    """Live pixels -> prediction serving: per fold, the fine-tuned ResNet-50
    trunk (bf16, or the int8 PTQ serving trunk with --int8-trunk) runs
    in-process ahead of the fused window ensemble — no offline feature
    export step (the reference's preprocessing_utils.py:734-823) in the
    loop. Fold standardization statistics are computed live from the train
    split's trunk features, exactly what the offline export + windowing
    chain would produce."""
    import jax.numpy as jnp

    from ..data.labels import powerset_error_labels
    from ..data.trials import compute_fold_stats, load_fold_trials
    from ..eval.ensemble import score_predictions
    from ..eval.serving import (PixelFrontEnd, load_ensemble,
                                predict_trial_from_pixels)
    from ..eval.summary import weighted_mean_std

    f1s, accs, weights = [], [], []
    for out in folds:
        fold_dir = os.path.join(args.pixels_root, out)
        train_trials = load_fold_trials(fold_dir, "train.csv")
        test_trials = load_fold_trials(fold_dir, "test.csv")
        ckpt_path = args.resnet_ckpt.format(fold=out)
        kw = dict(batch_size=args.serve_batch_size, mesh=mesh)
        if not args.bf16_trunk:
            kw["dtype"] = jnp.float32
        if args.int8_trunk:
            kw.update(int8=True,
                      calib_frames=train_trials[0].image_feats[:32])
        fe = PixelFrontEnd.from_checkpoint(ckpt_path, **kw)
        feats = np.concatenate([fe.features(t.image_feats)
                                for t in train_trials])
        kins = np.concatenate([t.kinematics for t in train_trials])
        stats = compute_fold_stats(feats, kins)
        calib = None
        if args.int8_fe:
            # calibrate the int8 FE on what it will see at serve time:
            # standardized train-split trunk-feature windows
            from ..data.datasets import standardize
            nw = max(1, min(64, len(feats) // cfg.window_size))
            calib = standardize(
                feats[: nw * cfg.window_size].reshape(
                    nw, cfg.window_size, -1), stats["image"])
        server = load_ensemble(
            args.runs_root, [args.run_a, args.run_b], args.setting, out,
            mode="soft_vote", mesh=mesh, int8_fe_calib=calib)
        all_preds, all_labels = [], []
        for t in test_trials:
            starts, preds, _ = predict_trial_from_pixels(
                fe, server, t.image_feats, t.kinematics, t.g_labels,
                cfg, stats)
            pw, nd_mask = powerset_error_labels(
                t.e_labels[starts], delete_ND=cfg.delete_ND)
            keep = ~nd_mask if cfg.delete_ND else np.ones(len(pw), bool)
            all_preds.append(preds[keep])
            all_labels.append(pw[keep, -1].astype(np.int64))
        preds = np.concatenate(all_preds)
        labels = np.concatenate(all_labels)
        m, _ = score_predictions(labels, preds, 2, "binary")
        f1s.append(m["f1"]); accs.append(m["accuracy"])
        weights.append(len(labels))
        print(f"[{out}] pixel-serve f1={m['f1']:.3f} acc={m['accuracy']:.3f} "
              f"trunk={'int8' if args.int8_trunk else ('bf16' if args.bf16_trunk else 'fp32')}")
    for name, vals in [("F1", f1s), ("Accuracy", accs)]:
        mu, sd = weighted_mean_std(vals, weights)
        print(f"pixel-serve soft_vote binary {name}: {mu:.3f} ± {sd:.3f}")


def _serve(args, folds):
    """Live fused ensemble inference (eval/serving.py::EnsembleServer):
    both member forwards + the soft-vote rule compile to ONE program, the
    window batch sharded over the mesh 'data' axis. Re-runs the members
    from their stored checkpoints instead of re-scoring stored probs."""
    from ..config import ExperimentConfig
    from ..data.datasets import build_window_fold
    from ..eval.ensemble import score_predictions
    from ..eval.serving import load_ensemble
    from .common import mesh_from_args

    if args.mode != "soft_vote":
        raise SystemExit("--serve supports soft_vote (binary members)")
    mesh = mesh_from_args(args)
    if mesh is not None:
        print(f"serving mesh: {dict(mesh.shape)}")
    run_dir = RunTracker.find_run(args.runs_root, args.run_a)
    with open(os.path.join(run_dir, "params.json")) as f:
        params = json.load(f)
    cfg = ExperimentConfig(**{k: v for k, v in params.items()
                              if k in ExperimentConfig.__dataclass_fields__})
    if args.pixels_root:
        if not args.resnet_ckpt:
            raise SystemExit("--pixels-root needs --resnet-ckpt")
        return _serve_pixels(args, folds, cfg, mesh)
    f1s, accs, weights = [], [], []
    for out in folds:
        train_fold, test_fold = build_window_fold(
            os.path.join(args.data_root, out), cfg, None)
        calib = (np.asarray(train_fold.images[:64], np.float32)
                 if args.int8_fe else None)
        server = load_ensemble(
            args.runs_root, [args.run_a, args.run_b], args.setting, out,
            mode="soft_vote", mesh=mesh, int8_fe_calib=calib)
        imgs = np.asarray(test_fold.images, np.float32)
        kins = np.asarray(test_fold.kinematics, np.float32)
        if args.int8_fe:
            # int8 feature store: quantize the fold's windows ONCE (layer-0
            # scale is calibration-batch-only, so one store serves every
            # member — tests/test_quant.py) and feed int8 to the server;
            # bit-identical to handing it the fp32 windows.
            from ..ops.quant import quantize_fe_input
            qfe = next((m.qfe for m in server.members if m.qfe is not None),
                       None)
            if qfe is not None:
                imgs = np.asarray(quantize_fe_input(qfe, imgs))
        n = len(test_fold)
        if mesh is not None:  # pad to the data-axis multiple for DP
            q = int(mesh.shape["data"])
            padn = (-n) % q
            if padn:
                imgs = np.pad(imgs, ((0, padn), (0, 0), (0, 0)))
                kins = np.pad(kins, ((0, padn), (0, 0), (0, 0)))
        preds, _ = server.predict(imgs, kins)
        preds = np.asarray(preds)[:n]
        labels = np.asarray(test_fold.labels_for("global"))
        m, _ = score_predictions(labels, preds, 2, "binary")
        f1s.append(m["f1"]); accs.append(m["accuracy"]); weights.append(n)
        print(f"[{out}] serve f1={m['f1']:.3f} acc={m['accuracy']:.3f}")
    for name, vals in [("F1", f1s), ("Accuracy", accs)]:
        mu, sd = weighted_mean_std(vals, weights)
        print(f"serve soft_vote binary {name}: {mu:.3f} ± {sd:.3f}")


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
    p.add_argument("--serve", action="store_true", default=False,
                   help="live fused inference from the stored checkpoints "
                        "(eval/serving.py) instead of offline re-scoring")
    p.add_argument("--data-root", default=None,
                   help="fold data for --serve")
    p.add_argument("--mesh", default=None,
                   help="device mesh for --serve ('auto' or 'N,M')")
    p.add_argument("--pixels-root", default=None,
                   help="--serve from RAW-FRAME fold dirs: the fine-tuned "
                        "ResNet-50 trunk runs live ahead of the ensemble "
                        "(no offline feature export)")
    p.add_argument("--resnet-ckpt", default=None,
                   help="resnet_finetune checkpoint for --pixels-root; "
                        "'{fold}' expands per fold")
    p.add_argument("--int8-fe", action="store_true", default=False,
                   help="serve members through the int8 PTQ "
                        "FeatureExtractor, calibrated on the train "
                        "split (1.30x on v5e at ~2%% logits drift)")
    p.add_argument("--int8-trunk", action="store_true", default=False,
                   help="serve pixels through the int8 PTQ trunk "
                        "(ops/quant.py; 1.37x the bf16 floor on v5e)")
    p.add_argument("--bf16-trunk", action="store_true", default=True,
                   help="bf16 trunk compute for --pixels-root (default)")
    p.add_argument("--fp32-trunk", dest="bf16_trunk", action="store_false")
    p.add_argument("--serve-batch-size", type=int, default=128,
                   help="trunk batch for --pixels-root (one compiled "
                        "program per serving session)")
    args = p.parse_args(argv)

    folds = [f for f in args.folds.split(",") if f]
    if args.serve:
        if not (args.data_root or args.pixels_root):
            raise SystemExit("--serve needs --data-root or --pixels-root")
        return _serve(args, folds)
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
