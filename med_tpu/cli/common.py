"""Shared CLI plumbing: argparse <-> ExperimentConfig, fold orchestration,
artifact writing."""

from __future__ import annotations

import argparse
import os
from typing import Callable, Dict, Optional

import numpy as np

from ..config import LOSO_FOLDS, ExperimentConfig
from ..data.datasets import build_frame_fold, build_window_fold
from ..eval.summary import create_summary, summary_to_text
from ..tracking import RunTracker
from ..train.checkpoint import save_checkpoint
from ..train.loop import train_frame_fold, train_window_fold

_CONFIG_FIELDS = [
    ("model_name", str), ("data_type", str), ("error_type", str),
    ("frequency", int), ("n_epochs", int), ("batch_size", int),
    ("lr", float), ("weight_decay", float), ("video_dims", int),
    ("out_features", int), ("hidden_size", int), ("num_layers", int),
    ("mstcn_stages", int), ("mstcn_layers", int), ("mstcn_f_maps", int),
    ("num_R", int), ("num_layers_R", int), ("num_layers_Basic", int),
    ("d_model", int), ("d_q", int), ("sequence_length", int),
    ("smooth_lambda", float), ("n_pairs", int), ("n_comparisons", int),
    ("seed", int), ("loss_or_f1", str), ("run_id", str), ("trial_batch", int),
    ("es_weight_scale", float),
]
_BOOL_FIELDS = ["lr_scheduler", "pos_weight", "delete_ND", "siamese",
                "mstcn_causal_conv", "use_pallas", "SRM", "use_skill_prompt",
                "fused_epoch", "fused_run"]


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache across processes: the relay's cold
    compiles cost minutes per program, so re-running a CLI with the same
    shapes should pay tracing only. Safe no-op if the backend does not
    support the cache."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get(
                "MED_TPU_CACHE", os.path.expanduser("~/.cache/med_tpu_xla")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        print(f"compilation cache unavailable: {e}")


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data-root", required=True,
                   help="directory containing one subdir per fold")
    p.add_argument("--video-root", default=None,
                   help="optional external 2048-d feature trials (COG features)")
    p.add_argument("--folds", default=",".join(LOSO_FOLDS),
                   help="comma-separated fold names")
    p.add_argument("--setting", default="LOSO")
    p.add_argument("--runs-root", default="runs")
    p.add_argument("--experiment", default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume folds from their last_state snapshots")
    p.add_argument("--mesh", default=None,
                   help="device mesh for multi-chip training: 'auto' "
                        "(all devices, data x model) or an explicit shape "
                        "like '4,2' (data,model). Default: single device")
    p.add_argument("--fold-parallel", action="store_true", default=False,
                   help="window families: train ALL folds simultaneously as "
                        "ONE sharded program (fold axis over the mesh 'data' "
                        "axis, parallel/folds.py::FoldParallelWindowRun)")
    p.add_argument("--trial-dp", action="store_true", default=False,
                   help="frame families: shard the --trial-batch axis over "
                        "the mesh 'data' axis (data-parallel trials)")
    p.add_argument("--sequence-parallel", action="store_true", default=False,
                   help="frame families: shard each trial's TIME axis over "
                        "the mesh 'data' axis (parallel/sp_train.py) — "
                        "trains sequences no single chip can hold")
    defaults = ExperimentConfig()
    for name, typ in _CONFIG_FIELDS:
        p.add_argument(f"--{name.replace('_', '-').lower()}", dest=name,
                       type=typ, default=getattr(defaults, name, None))
    for name in _BOOL_FIELDS:
        flag = name.replace("_", "-").lower()
        p.add_argument(f"--{flag}", dest=name, action="store_true",
                       default=getattr(defaults, name))
        p.add_argument(f"--no-{flag}", dest=name, action="store_false")
    return p


def config_from_args(args, **overrides) -> ExperimentConfig:
    kw = {}
    for name, _ in _CONFIG_FIELDS:
        v = getattr(args, name, None)
        if v is not None:
            kw[name] = v
    for name in _BOOL_FIELDS:
        kw[name] = getattr(args, name)
    kw.update(overrides)
    return ExperimentConfig(**kw)


def mesh_from_args(args):
    """Build the jax.sharding.Mesh requested by ``--mesh`` (None if the flag
    is absent). 'auto' lays all visible devices out as (data, model) with
    model=2 when the count is even (parallel/mesh.py::make_mesh); an
    explicit 'N' or 'N,M' pins the shape."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    import math

    import jax

    from ..parallel import make_mesh

    if spec == "auto":
        return make_mesh()
    shape = tuple(int(s) for s in spec.split(","))
    need = math.prod(shape)
    devices = jax.devices()
    if need > len(devices):
        raise SystemExit(f"--mesh {spec} needs {need} devices, "
                         f"have {len(devices)}")
    return make_mesh(shape=shape, devices=devices[:need])


def make_tracker(args, cfg: ExperimentConfig) -> RunTracker:
    enable_compilation_cache()
    experiment = args.experiment or (
        f"{cfg.model_name}_{cfg.frequency}Hz_{cfg.data_type}"
    )
    tracker = RunTracker(root=args.runs_root, experiment=experiment)
    tracker.log_params(cfg.to_dict())
    print(f"run: {tracker.dir}")
    return tracker


def _dump_best(tracker: RunTracker, tag: str, best: dict, cfg) -> None:
    dump = {
        k: v for k, v in best.items()
        if np.isscalar(v) or isinstance(v, (int, float))
    }
    for k in ("preds", "probs", "labels", "gestures", "raw_labels"):
        if best.get(k) is not None:
            dump[k] = np.asarray(best[k]).tolist()
    if best.get("subjects") is not None:
        dump["subjects"] = [str(s) for s in best["subjects"]]
    dump["cm"] = np.asarray(best["cm"]).tolist()
    tracker.log_dict(dump, f"best_model_{tag}.json")


def _plot_fold(tracker, history, setting, out, best) -> None:
    """Per-fold curves + best-epoch confusion matrix
    (train_window.ipynb cell 2 plotting)."""
    try:
        from ..viz import plot_cm, plot_results_LOSO

        image_dir = os.path.join(tracker.dir, "images")
        plot_results_LOSO(
            [h["train_f1"] for h in history],
            [h["test_f1"] for h in history],
            [h["train_loss"] for h in history],
            [h["test_loss"] for h in history],
            setting, out, image_dir,
        )
        cm = np.asarray(best["cm"])
        plot_cm(None, cm, image_dir,
                binary="global" if cm.shape[0] == 2 else None)
    except Exception as e:  # plotting must never kill a training run
        print(f"plotting skipped: {e}")


def run_window_folds(
    args,
    cfg: ExperimentConfig,
    extras_fn: Optional[Callable[[str, object, object], dict]] = None,
    siamese_fn: Optional[Callable] = None,
) -> Dict[str, dict]:
    """Train all folds of a window experiment; save checkpoints, artifacts
    and the weighted summary (the fold loop of train_window.ipynb cell 2)."""
    if getattr(args, "fold_parallel", False):
        return run_window_folds_parallel(args, cfg, extras_fn=extras_fn,
                                         siamese_fn=siamese_fn)
    folds = [f for f in args.folds.split(",") if f]
    tracker = make_tracker(args, cfg)
    fold_results, samples_tr, samples_te = {}, {}, {}
    # ONE Experiment for all folds: with fold-shape bucketing
    # (cfg.fold_pad_quantum) the per-fold whole-run programs have identical
    # shapes, so sharing the jitted step/run callables makes folds 2..N jit
    # cache hits instead of minutes-long relay recompiles
    from ..train.engine import Experiment

    shared_exp = Experiment(cfg)
    for out in folds:
        fold_dir = os.path.join(args.data_root, out)
        train_fold, test_fold = build_window_fold(fold_dir, cfg, args.video_root)
        tag = f"{args.setting}_{out}"
        print(f"[{tag}] train windows={len(train_fold)} test={len(test_fold)}")
        extras = extras_fn(out, train_fold, test_fold) if extras_fn else None
        siamese_data = siamese_fn(out, train_fold, test_fold) if siamese_fn else None
        res = train_window_fold(cfg, train_fold, test_fold, tracker=tracker,
                                tag=tag, siamese_data=siamese_data,
                                extras=extras, exp=shared_exp,
                                resume=getattr(args, "resume", False))
        best = res["best"]
        save_checkpoint(
            tracker.checkpoint_path(f"best_model_{tag}.npz"),
            res["checkpoint"]["params"], res["checkpoint"]["batch_stats"],
            res["checkpoint"].get("constants"), meta={"cfg": cfg.to_dict()},
        )
        _dump_best(tracker, tag, best, cfg)
        _plot_fold(tracker, res["history"], args.setting, out, best)
        fold_results[out] = best
        samples_tr[out] = len(train_fold)
        samples_te[out] = len(test_fold)
        print(f"[{tag}] best test F1={best['test_f1']:.3f} "
              f"acc={best['test_acc']:.3f}")
    summary = create_summary(fold_results, samples_tr, samples_te)
    tracker.log_dict(summary, "summary.json")
    print(summary_to_text(summary))
    return fold_results, tracker


def run_window_folds_parallel(
    args,
    cfg: ExperimentConfig,
    extras_fn: Optional[Callable] = None,
    siamese_fn: Optional[Callable] = None,
) -> Dict[str, dict]:
    """``--fold-parallel``: ALL LOSO folds trained simultaneously as ONE
    sharded program (parallel/folds.py::FoldParallelWindowRun — the fold
    axis rides the mesh 'data' axis, zero collectives), then identical
    per-fold host bookkeeping/artifacts to the sequential
    :func:`run_window_folds` (parity pinned in tests/test_cli.py)."""
    if siamese_fn is not None or extras_fn is not None:
        raise SystemExit("--fold-parallel supports the plain window family "
                         "(no siamese pairs / sequential gates)")
    if getattr(args, "resume", False):
        raise SystemExit("--fold-parallel does not support --resume "
                         "(the whole run is one device program)")
    import time

    import jax

    from ..parallel.folds import FoldParallelWindowRun, stack_trees
    from ..train.engine import Experiment
    from ..train.loop import (
        _class_counts,
        _device_batch,
        _fused_run_history,
    )
    from ..data.datasets import window_batches

    mesh = mesh_from_args(args)
    fold_names = [f for f in args.folds.split(",") if f]
    tracker = make_tracker(args, cfg)
    exp = Experiment(cfg)

    folds, states = [], []
    for out in fold_names:
        fold_dir = os.path.join(args.data_root, out)
        tf, ef = build_window_fold(fold_dir, cfg, args.video_root)
        folds.append((tf, ef))
        print(f"[{args.setting}_{out}] train windows={len(tf)} "
              f"test={len(ef)}")
        # same init key per fold as the sequential loop (loop.py:119)
        b0 = _device_batch(next(window_batches(tf, cfg, shuffle=False)))
        states.append(exp.init_state(jax.random.key(cfg.seed), b0,
                                     class_counts=_class_counts(cfg, tf)))

    runner = FoldParallelWindowRun(exp, cfg, folds, mesh=mesh)
    stacked = stack_trees(states)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        stacked = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P("data", *([None] * (x.ndim - 1)))
                if x.ndim >= 1 and x.shape[0] % n_data == 0 else P())),
            stacked)
        print(f"fold-parallel mesh: {dict(mesh.shape)}")

    E = cfg.n_epochs
    t0 = time.time()
    _, bckpts, outs = runner.run(stacked, 0, E)
    tcms, tlosses, preds_all, probs_all, ecms, elosses, scores = (
        np.asarray(jax.device_get(o)) for o in outs)
    wall = time.time() - t0
    bckpts = jax.device_get(bckpts)

    average = "binary" if (cfg.error_type == "global" or cfg.siamese) \
        else "macro"
    B = cfg.batch_size
    fold_results, samples_tr, samples_te = {}, {}, {}
    for f, (out, (tf, ef)) in enumerate(zip(fold_names, folds)):
        tag = f"{args.setting}_{out}"
        st = -(-len(tf) // B)   # real steps (canonical-budget surplus steps
        se = -(-len(ef) // B)   # are fully-masked no-ops; trim like the
        history = []            # single-fold fused run, loop.py:337)
        best_i, degenerate = _fused_run_history(
            cfg, E, 0, tcms[f][:, :st], tlosses[f][:, :st],
            ecms[f][:, :se], elosses[f][:, :se], scores[f], average,
            True, wall / len(folds), "inference_ms_per_window", len(ef),
            tracker, history, tag)
        preds = preds_all[f, best_i].reshape(-1)[: len(ef)]
        probs = probs_all[f, best_i].reshape(
            (-1,) + probs_all.shape[4:])[: len(ef)]
        best = dict(history[best_i])
        best.update({
            "preds": preds,
            "probs": probs,
            "labels": ef.labels_for(cfg.error_type),
            "raw_labels": ef.e_raw,
            "gestures": ef.g_labels.reshape(-1),
            "subjects": ef.subjects,
            "cm": np.sum(ecms[f, best_i, :se], axis=0),
        })
        if degenerate:
            best["all_epochs_non_finite"] = True
        ckpt = jax.tree.map(lambda x: np.asarray(x[f]), bckpts)
        save_checkpoint(
            tracker.checkpoint_path(f"best_model_{tag}.npz"),
            ckpt["params"], ckpt["batch_stats"], ckpt.get("constants"),
            meta={"cfg": cfg.to_dict()},
        )
        _dump_best(tracker, tag, best, cfg)
        _plot_fold(tracker, history, args.setting, out, best)
        fold_results[out] = best
        samples_tr[out] = len(tf)
        samples_te[out] = len(ef)
        print(f"[{tag}] best test F1={best['test_f1']:.3f} "
              f"acc={best['test_acc']:.3f}")
    summary = create_summary(fold_results, samples_tr, samples_te)
    tracker.log_dict(summary, "summary.json")
    print(summary_to_text(summary))
    return fold_results, tracker


def run_frame_folds(
    args,
    cfg: ExperimentConfig,
    frozen_fn: Optional[Callable[[str], object]] = None,
    gates_fn: Optional[Callable[[str, list, list], dict]] = None,
) -> Dict[str, dict]:
    mesh = None
    sp_mesh = None
    if getattr(args, "sequence_parallel", False):
        if getattr(args, "trial_dp", False):
            raise SystemExit("--sequence-parallel and --trial-dp are "
                             "mutually exclusive")
        sp_mesh = mesh_from_args(args)
        if sp_mesh is None:
            from ..parallel import make_mesh

            sp_mesh = make_mesh()
        print(f"sequence-parallel mesh: {dict(sp_mesh.shape)} "
              f"(T sharded over 'data'={sp_mesh.shape['data']})")
    if getattr(args, "trial_dp", False):
        # data-parallel trials: the stacked --trial-batch axis (and the
        # state) ride the mesh 'data' axis through the per-group step loop
        # (whole-run fusion stays single-device; the sharded path is the
        # plain per-epoch loop)
        mesh = mesh_from_args(args)
        if mesh is None:
            from ..parallel import make_mesh

            mesh = make_mesh()
        n_data = int(mesh.shape["data"])
        if cfg.trial_batch % n_data:
            print(f"--trial-dp: trial_batch {cfg.trial_batch} not a "
                  f"multiple of the data axis {n_data}; batches will "
                  f"replicate (see parallel/mesh.py::shard_batch)")
        if cfg.fused_epoch or cfg.fused_run:
            cfg = cfg.replace(fused_epoch=False, fused_run=False)
        print(f"trial-DP mesh: {dict(mesh.shape)} "
              f"(trial_batch={cfg.trial_batch})")
    folds = [f for f in args.folds.split(",") if f]
    tracker = make_tracker(args, cfg)
    fold_results, samples_tr, samples_te = {}, {}, {}
    frame_dumps = {}
    # shared Experiment: folds whose padded trial shapes coincide reuse the
    # jitted step / fused-run callables instead of recompiling
    from ..train.engine import Experiment

    shared_exp = Experiment(cfg)
    for out in folds:
        fold_dir = os.path.join(args.data_root, out)
        train_trials = build_frame_fold(fold_dir, cfg, "train.csv", args.video_root)
        test_trials = build_frame_fold(fold_dir, cfg, "test.csv", args.video_root)
        tag = f"{args.setting}_{out}"
        print(f"[{tag}] train trials={len(train_trials)} test={len(test_trials)}")
        frozen = frozen_fn(out) if frozen_fn else None
        gates = gates_fn(out, train_trials, test_trials) if gates_fn else None
        if sp_mesh is not None:
            from ..parallel.sp_train import train_sp_frame_fold

            res = train_sp_frame_fold(
                cfg, train_trials, test_trials, sp_mesh, tracker=tracker,
                frozen=frozen, gates=gates, tag=tag,
                resume=getattr(args, "resume", False))
        else:
            res = train_frame_fold(cfg, train_trials, test_trials,
                                   tracker=tracker,
                                   frozen=frozen, gates=gates, tag=tag,
                                   exp=shared_exp,
                                   resume=getattr(args, "resume", False),
                                   mesh=mesh)
        best = res["best"]
        save_checkpoint(
            tracker.checkpoint_path(f"best_model_{tag}.npz"),
            res["checkpoint"]["params"], res["checkpoint"]["batch_stats"],
            res["checkpoint"].get("constants"), meta={"cfg": cfg.to_dict()},
        )
        _dump_best(tracker, tag, best, cfg)
        _plot_fold(tracker, res["history"], args.setting, out, best)
        fold_results[out] = best
        samples_tr[out] = sum(t.n_frames for t in train_trials)
        samples_te[out] = sum(t.n_frames for t in test_trials)
        frame_dumps[out] = {k: best[k] for k in
                            ("preds", "labels", "gestures", "subjects")}
        print(f"[{tag}] best test F1={best['test_f1']:.3f}")
    summary = create_summary(fold_results, samples_tr, samples_te)
    tracker.log_dict(summary, "summary.json")
    print(summary_to_text(summary))

    # frame -> window rollup (train_frame.ipynb cell 4)
    from ..eval.rollup import compute_window_metrics

    binary = cfg.error_type == "global"
    wsum, wcm = compute_window_metrics(
        frame_dumps, cfg.window_size, cfg.stride, binary=binary,
        n_classes=2 if binary else 6,
    )
    tracker.log_dict({"windowed": wsum, "cm": wcm.tolist()},
                     "windowed_metrics.json")
    print("windowed:", wsum)
    return fold_results, tracker
