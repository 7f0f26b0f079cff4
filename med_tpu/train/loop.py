"""Epoch loops: train a fold end-to-end with best-checkpoint selection.

Replaces the reference notebooks' fold loops (train_window.ipynb cell 2,
train_frame.ipynb cell 2): per-epoch cosine LR, train + eval passes, metric
logging, and best-model bookkeeping by test weighted-F1 or loss
(``loss_or_f1``). Device->host sync happens once per epoch (stacked
confusion matrices), not per batch.

Metric conventions follow the reference:
- window-family *train* metrics are averaged over per-batch values
  (modeling_utils.py:398-402); *test* metrics are computed over pooled
  predictions (:781-786);
- frame-family metrics are pooled over all frames for both splits
  (:1566-1574).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..config import ExperimentConfig
from ..data.datasets import (
    FrameTrial,
    WindowFold,
    frame_batch,
    window_batches,
)
from ..ops.metrics import metrics_from_cm
from ..tracking import RunTracker
from .engine import Experiment
from .optim import epoch_lr, set_lr


def _class_counts(cfg: ExperimentConfig, train_fold) -> Optional[np.ndarray]:
    if not cfg.pos_weight:
        return None
    if cfg.error_type == "global":
        dist = train_fold.binary_error_distribution
        return np.asarray(dist, np.float32)
    dist = np.asarray(train_fold.specific_error_distribution, np.float32).copy()
    # reference ES tweak: counter the extreme inverse frequencies of the
    # rare powerset classes (train_window_ES.ipynb cell 2 divides the
    # weights of classes 1/3/4/5 by 1.5; classes 0/2 untouched)
    if cfg.es_weight_scale != 1.0 and dist.shape[0] >= 6:
        dist[[1, 3, 4, 5]] /= cfg.es_weight_scale
    return dist


def _epoch_metrics(cms: List[np.ndarray], average: str, per_batch: bool) -> Dict[str, float]:
    if per_batch:
        vals = [metrics_from_cm(cm, average) for cm in cms]
        keys = vals[0].keys()
        out = {k: float(np.mean([v[k] for v in vals])) for k in keys}
        if average == "binary":
            out["f1_weighted"] = float(
                np.mean([metrics_from_cm(cm, "weighted")["f1"] for cm in cms])
            )
        out["cm"] = np.sum(cms, axis=0)
        return out
    total = np.sum(cms, axis=0)
    out = dict(metrics_from_cm(total, average))
    if average == "binary":
        out["f1_weighted"] = metrics_from_cm(total, "weighted")["f1"]
    out["cm"] = total
    return out


def _average_for(cfg: ExperimentConfig) -> str:
    if cfg.error_type == "global" or cfg.siamese:
        return "binary"
    return "macro"


def _better(cfg: ExperimentConfig, candidate: Dict, best: Optional[Dict]) -> bool:
    if best is None:
        return True
    if cfg.loss_or_f1 == "loss":
        return candidate["test_loss"] < best["test_loss"]
    return candidate.get("test_f1_weighted", candidate["test_f1"]) > best.get(
        "test_f1_weighted", best["test_f1"]
    )


def train_window_fold(
    cfg: ExperimentConfig,
    train_fold: WindowFold,
    test_fold: WindowFold,
    tracker: Optional[RunTracker] = None,
    tag: str = "LOSO_1Out",
    exp: Optional[Experiment] = None,
    siamese_data: Optional[dict] = None,
    extras: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    resume: bool = False,
) -> Dict[str, Any]:
    """Full training of one fold for the window families.

    ``siamese_data``: {'train': (img (P,2,W,F), kin, labels),
    'test': (...), 'test_position_2': (Pt,)} overrides the window batches
    with pair batches when cfg.siamese.
    ``extras``: {'train': {name: (Nw,…)}, 'test': …} additional per-window
    arrays (e.g. the sequential stage's binary gate).
    """
    exp = exp or Experiment(cfg)
    average = _average_for(cfg)

    extras = extras or {}
    if cfg.siamese:
        batches0 = [next(_siamese_batches(cfg, siamese_data["train"],
                                          shuffle=False))]
    else:
        batches0 = [next(window_batches(train_fold, cfg, shuffle=False,
                                        extras=extras.get("train")))]
    state = exp.init_state(
        jax.random.key(cfg.seed),
        _device_batch(batches0[0]),
        class_counts=_class_counts(cfg, train_fold),
    )

    fused = None
    fused_eval = None
    fused_ok = cfg.fused_epoch and exp.family in ("window", "siamese")

    best: Optional[Dict] = None
    best_ckpt = None
    history = []
    start_epoch = 0
    resume_path = tracker.checkpoint_path(f"last_state_{tag}.npz") if tracker else None
    if resume and resume_path and os.path.exists(resume_path):
        from .checkpoint import load_train_state

        state, start_epoch = load_train_state(resume_path, state)
        print(f"[{tag}] resumed at epoch {start_epoch}")

    if cfg.fused_run and fused_ok and start_epoch < cfg.n_epochs:
        if cfg.siamese:
            return _train_siamese_fold_fused_run(
                cfg, exp, state, siamese_data, tracker, tag, start_epoch,
                resume_path, history,
            )
        return _train_window_fold_fused_run(
            cfg, exp, state, train_fold, test_fold, extras, tracker, tag,
            start_epoch, resume_path, average, history,
        )
    if fused_ok:
        from .fused import FusedWindowEpoch, FusedWindowEval

        if cfg.siamese:
            # pair arrays ride the same fused scan (identical batch protocol
            # to _siamese_batches: shuffle(seed+epoch), pad idx 0, mask)
            tr = siamese_data["train"]
            te = siamese_data["test"]
            fused = FusedWindowEpoch(exp, cfg, arrays={
                "images": tr[0], "kinematics": tr[1], "labels": tr[2]})
            fused_eval = FusedWindowEval(exp, cfg, arrays={
                "images": te[0], "kinematics": te[1], "labels": te[2]})
        else:
            fused = FusedWindowEpoch(exp, cfg, train_fold,
                                     extras=extras.get("train"))
            fused_eval = FusedWindowEval(exp, cfg, test_fold,
                                         extras=extras.get("test"))

    for epoch in range(start_epoch, cfg.n_epochs):
        state = state.replace(opt_state=set_lr(state.opt_state, epoch_lr(cfg, epoch)))

        t0 = time.time()
        if fused is not None:
            state, cms_stacked, losses_arr = fused.run_epoch(state, epoch)
            jax.block_until_ready(losses_arr)
            cms = list(np.asarray(cms_stacked))
            losses = list(np.asarray(losses_arr))
        else:
            cms, losses = [], []
            train_iter = (
                _siamese_batches(cfg, siamese_data["train"], shuffle=True,
                                 epoch=epoch, seed=cfg.seed)
                if cfg.siamese
                else window_batches(train_fold, cfg, shuffle=True,
                                    seed=cfg.seed, epoch=epoch,
                                    extras=extras.get("train"))
            )
            from ..utils.prefetch import prefetch_to_device

            for batch in prefetch_to_device(
                (_device_batch(b) for b in train_iter), depth=cfg.prefetch_depth
            ):
                state, metrics = exp.train_step(state, batch)
                cms.append(metrics["cm"])
                losses.append(metrics["loss"])
        train_time = time.time() - t0
        train_cms = [np.asarray(c) for c in cms]
        train_m = _epoch_metrics(train_cms, average, per_batch=True)
        train_loss = float(np.mean([float(l) for l in losses]))
        if not np.isfinite(train_loss):
            # NaN watchdog: halt and keep the best checkpoint so far rather
            # than corrupting subsequent epochs (no reference counterpart)
            print(f"[{tag}] non-finite train loss at epoch {epoch}; stopping")
            break

        ev = evaluate_window_fold(cfg, exp, state, test_fold, siamese_data,
                                  extras=extras.get("test"),
                                  fused_eval=fused_eval)
        epoch_row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "train_f1": train_m["f1"],
            "train_f1_weighted": train_m.get("f1_weighted", train_m["f1"]),
            "train_acc": train_m["accuracy"],
            "train_jaccard": train_m["jaccard"],
            "train_time": train_time,
            **{f"test_{k}": v for k, v in ev["metrics"].items()},
        }
        history.append(epoch_row)
        if tracker:
            tracker.log_metrics(
                {k: v for k, v in epoch_row.items() if np.isscalar(v)}, step=epoch
            )

        if _better(cfg, epoch_row, best):
            best = dict(epoch_row)
            best.update(
                {
                    "preds": ev["preds"],
                    "probs": ev["probs"],
                    "labels": ev["labels"],
                    "raw_labels": ev.get("raw_labels"),
                    "gestures": ev.get("gestures"),
                    "subjects": ev.get("subjects"),
                    "cm": ev["cm"],
                }
            )
            best_ckpt = jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}
            )
        if resume_path:
            from .checkpoint import save_train_state

            save_train_state(resume_path, state, epoch)

    return {"best": best, "history": history, "checkpoint": best_ckpt, "exp": exp}


def _fused_run_history(cfg, E, start_epoch, tcms, tlosses, ecms, elosses,
                       scores, average, per_batch_train, wall, infer_key,
                       infer_denom, tracker, history, tag="", ev_update=None):
    """Shared host bookkeeping after a fused whole-run: rebuild the per-epoch
    history rows from the stacked device results and replay the device's
    strict-better selection over the device-computed scores (so the returned
    best index matches the on-device checkpoint by construction). Returns
    the best epoch index (relative to the run).

    ``ev_update(i)``: optional per-epoch dict merged over the pooled eval
    metrics (the siamese vote metrics replace f1/acc/jaccard, mirroring
    evaluate_window_fold's metrics.update)."""
    use_loss = cfg.loss_or_f1 == "loss"
    best_i = None
    best_score = np.inf if use_loss else -np.inf
    nan_warned = False
    for i in range(E):
        epoch = start_epoch + i
        train_m = _epoch_metrics(list(tcms[i]), average,
                                 per_batch=per_batch_train)
        train_loss = float(np.mean(tlosses[i]))
        if not np.isfinite(train_loss) and not nan_warned:
            # the per-epoch loop's NaN watchdog halts; the fused run cannot —
            # non-finite epochs simply never win selection (NaN compares False)
            print(f"[{tag}] non-finite train loss at epoch {epoch} "
                  "(fused run continues; epoch cannot be selected)")
            nan_warned = True
        pooled = _epoch_metrics(list(ecms[i]), average, per_batch=False)
        ev_metrics = {
            "loss": float(np.mean(elosses[i])),
            "f1": pooled["f1"],
            "f1_weighted": pooled.get("f1_weighted", pooled["f1"]),
            "acc": pooled["accuracy"],
            "jaccard": pooled["jaccard"],
            infer_key: wall / E / max(infer_denom, 1) * 1e3,
        }
        if ev_update is not None:
            ev_metrics.update(ev_update(i))
        epoch_row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "train_f1": train_m["f1"],
            "train_f1_weighted": train_m.get("f1_weighted", train_m["f1"]),
            "train_acc": train_m["accuracy"],
            "train_jaccard": train_m["jaccard"],
            "train_time": wall / E,
            **{f"test_{k}": v for k, v in ev_metrics.items()},
        }
        history.append(epoch_row)
        if tracker:
            tracker.log_metrics(
                {k: v for k, v in epoch_row.items() if np.isscalar(v)},
                step=epoch)
        sc = float(scores[i])
        if (sc < best_score) if use_loss else (sc > best_score):
            best_i, best_score = i, sc
    # every epoch non-finite: no epoch ever won the device selection, so the
    # device checkpoint is the INITIAL params. Surface that explicitly
    # (degenerate=True) instead of silently pairing epoch-0 predictions with
    # the untrained checkpoint.
    if best_i is None:
        print(f"[{tag}] every epoch score non-finite: returned checkpoint is "
              "the initial params; prediction dump marked degenerate")
        return 0, True
    return best_i, False


def _train_window_fold_fused_run(cfg, exp, state, train_fold, test_fold,
                                 extras, tracker, tag, start_epoch,
                                 resume_path, average, history):
    """Whole-run fused path: every remaining epoch (train scan + eval scan +
    on-device best-checkpoint selection) in ONE device program
    (train/fused.py::FusedWindowRun), then identical host bookkeeping from
    the stacked per-epoch results."""
    from .fused import FusedWindowRun

    runner = FusedWindowRun(exp, cfg, train_fold, test_fold,
                            train_extras=extras.get("train"),
                            test_extras=extras.get("test"))
    E = cfg.n_epochs - start_epoch
    t0 = time.time()
    state, bckpt_dev, outs = runner.run(state, start_epoch, E)
    tcms, tlosses, preds_all, probs_all, ecms, elosses, scores = (
        np.asarray(jax.device_get(o)) for o in outs)
    wall = time.time() - t0
    best_ckpt = jax.device_get(bckpt_dev)
    # drop the fold-bucketing surplus steps (fully masked no-ops) before the
    # host bookkeeping: their zero CMs / garbage losses must not enter the
    # per-batch metric means
    st, se = runner.train.steps_real, runner.eval.steps_real
    tcms, tlosses = tcms[:, :st], tlosses[:, :st]
    ecms, elosses = ecms[:, :se], elosses[:, :se]

    n_test = runner.n_test
    best_i, degenerate = _fused_run_history(
        cfg, E, start_epoch, tcms, tlosses, ecms, elosses, scores, average,
        True, wall, "inference_ms_per_window", n_test, tracker, history, tag)

    preds = preds_all[best_i].reshape(-1)[:n_test]
    probs = probs_all[best_i].reshape((-1,) + probs_all.shape[3:])[:n_test]
    best = dict(history[len(history) - E + best_i])
    best.update({
        "preds": preds,
        "probs": probs,
        "labels": test_fold.labels_for(cfg.error_type),
        "raw_labels": test_fold.e_raw,
        "gestures": test_fold.g_labels.reshape(-1),
        "subjects": test_fold.subjects,
        "cm": np.sum(ecms[best_i], axis=0),
    })
    if degenerate:
        best["all_epochs_non_finite"] = True
    if resume_path:
        from .checkpoint import save_train_state

        # the loader resumes at saved+1: record the last COMPLETED epoch
        save_train_state(resume_path, state, cfg.n_epochs - 1)
    return {"best": best, "history": history, "checkpoint": best_ckpt, "exp": exp}


def _train_siamese_fold_fused_run(cfg, exp, state, siamese_data, tracker,
                                  tag, start_epoch, resume_path, history):
    """Whole-run fused path for the siamese family (FusedSiameseRun): the
    pair arrays ride the window fused scans and the on-device best selection
    uses the VOTE weighted-F1 (loop.py::siamese_vote). Host bookkeeping
    recomputes the vote metrics per epoch so history rows match the
    per-epoch loop exactly."""
    from .fused import FusedSiameseRun

    runner = FusedSiameseRun(exp, cfg, siamese_data)
    E = cfg.n_epochs - start_epoch
    t0 = time.time()
    state, bckpt_dev, outs = runner.run(state, start_epoch, E)
    tcms, tlosses, preds_all, probs_all, ecms, elosses, scores = (
        np.asarray(jax.device_get(o)) for o in outs)
    wall = time.time() - t0
    best_ckpt = jax.device_get(bckpt_dev)

    n_test = runner.n_test
    pos2 = siamese_data["test_position_2"]
    wlabels = siamese_data["test_window_labels"]
    vote_cms = {}

    def ev_update(i):
        pflat = preds_all[i].reshape(-1)[:n_test]
        vp, vl = siamese_vote(pflat, pos2, wlabels)
        cm = np.zeros((2, 2), np.int64)
        for y, p in zip(vl, vp):
            cm[y, p] += 1
        vote_cms[i] = cm
        vm = metrics_from_cm(cm, "binary")
        return {"f1": vm["f1"], "acc": vm["accuracy"],
                "jaccard": vm["jaccard"],
                "f1_weighted": metrics_from_cm(cm, "weighted")["f1"]}

    best_i, degenerate = _fused_run_history(
        cfg, E, start_epoch, tcms, tlosses, ecms, elosses, scores, "binary",
        True, wall, "inference_ms_per_window", n_test, tracker, history, tag,
        ev_update=ev_update)

    preds = preds_all[best_i].reshape(-1)[:n_test]
    probs = probs_all[best_i].reshape((-1,) + probs_all.shape[3:])[:n_test]
    best = dict(history[len(history) - E + best_i])
    best.update({
        "preds": preds,
        "probs": probs,
        "labels": siamese_data["test"][2],
        "raw_labels": None,
        "gestures": None,
        "subjects": None,
        "cm": vote_cms[best_i],
    })
    if degenerate:
        best["all_epochs_non_finite"] = True
    if resume_path:
        from .checkpoint import save_train_state

        save_train_state(resume_path, state, cfg.n_epochs - 1)
    return {"best": best, "history": history, "checkpoint": best_ckpt, "exp": exp}


def evaluate_window_fold(cfg, exp, state, test_fold, siamese_data=None,
                         extras=None, fused_eval=None) -> Dict:
    """Pooled eval pass; returns metrics + ordered prediction dumps."""
    average = _average_for(cfg)
    if fused_eval is not None:
        t0 = time.time()
        preds_arr, probs_arr, cms_arr, losses_arr = fused_eval.run(state)
        t_infer = time.time() - t0
        n_units = fused_eval.n
        preds = [preds_arr]
        probs = [probs_arr]
        cms = list(cms_arr)
        losses = [float(l) for l in losses_arr]
    else:
        preds, probs, cms, losses = [], [], [], []
        t_infer, n_units = 0.0, 0
        test_iter = (
            _siamese_batches(cfg, siamese_data["test"], shuffle=False)
            if cfg.siamese
            else window_batches(test_fold, cfg, shuffle=False, extras=extras)
        )
        for batch in test_iter:
            valid = batch["_valid"]
            t0 = time.time()
            m = exp.eval_step(state, _device_batch(batch))
            jax.block_until_ready(m["preds"])
            t_infer += time.time() - t0
            n_units += valid
            preds.append(np.asarray(m["preds"])[:valid])
            probs.append(np.asarray(m["probs"])[:valid])
            cms.append(np.asarray(m["cm"]))
            losses.append(float(m["loss"]))
    pooled = _epoch_metrics(cms, average, per_batch=False)
    metrics = {
        "loss": float(np.mean(losses)),
        "f1": pooled["f1"],
        "f1_weighted": pooled.get("f1_weighted", pooled["f1"]),
        "acc": pooled["accuracy"],
        "jaccard": pooled["jaccard"],
        "inference_ms_per_window": t_infer / max(n_units, 1) * 1e3,
    }
    if cfg.siamese:
        labels = siamese_data["test"][2]
        out = {
            "metrics": metrics,
            "preds": np.concatenate(preds),
            "probs": np.concatenate(probs),
            "labels": labels,
            "cm": pooled["cm"],
        }
        # majority vote per test window (reference modeling_utils.py:1180-1250)
        vote_preds, vote_labels = siamese_vote(
            out["preds"], siamese_data["test_position_2"],
            siamese_data["test_window_labels"],
        )
        vote_cm = np.zeros((2, 2), np.int64)
        for y, p in zip(vote_labels, vote_preds):
            vote_cm[y, p] += 1
        vm = metrics_from_cm(vote_cm, "binary")
        metrics.update(
            {"f1": vm["f1"], "acc": vm["accuracy"], "jaccard": vm["jaccard"],
             "f1_weighted": metrics_from_cm(vote_cm, "weighted")["f1"]}
        )
        out["vote_preds"] = vote_preds
        out["vote_labels"] = vote_labels
        out["cm"] = vote_cm
        return out
    return {
        "metrics": metrics,
        "preds": np.concatenate(preds),
        "probs": np.concatenate(probs),
        "labels": test_fold.labels_for(cfg.error_type),
        "raw_labels": test_fold.e_raw,
        "gestures": test_fold.g_labels.reshape(-1),
        "subjects": test_fold.subjects,
        "cm": pooled["cm"],
    }


def siamese_vote(pair_preds, position_2, window_labels):
    """Majority vote of pair predictions grouped by test-window position."""
    pos = np.asarray(position_2)
    uniq = np.unique(pos)
    votes = np.zeros(len(uniq), np.int64)
    labels = np.zeros(len(uniq), np.int64)
    for k, u in enumerate(uniq):
        sel = pos == u
        votes[k] = int(np.asarray(pair_preds)[sel].mean() >= 0.5)
        labels[k] = int(window_labels[u])
    return votes, labels


def _siamese_batches(cfg, data, shuffle=False, epoch=0, seed=42):
    img, kin, labels = data[0], data[1], data[2]
    n = len(img)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    B = cfg.batch_size
    for start in range(0, n, B):
        take = idx[start : start + B]
        pad = B - len(take)
        sel = np.concatenate([take, np.zeros(pad, np.int64)]) if pad else take
        mask = np.concatenate(
            [np.ones(len(take), np.float32), np.zeros(pad, np.float32)]
        )
        yield {
            "images": img[sel],
            "kinematics": kin[sel],
            "labels": labels[sel],
            "mask": mask,
            "_index": sel,
            "_valid": len(take),
        }


def _device_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if not k.startswith("_")}


# --------------------------------------------------------------------- frame
def train_frame_fold(
    cfg: ExperimentConfig,
    train_trials: List[FrameTrial],
    test_trials: List[FrameTrial],
    tracker: Optional[RunTracker] = None,
    exp: Optional[Experiment] = None,
    frozen: Any = None,
    gates: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    tag: str = "",
    resume: bool = False,
    mesh=None,
) -> Dict[str, Any]:
    """Frame-level training (TeCNo / TransSVNet / COG, batch = one trial).

    ``gates``: {'train': {trial_name: (T,) 0/1}, 'test': …} for the
    sequential stage-2 regimes (binary-stage predictions / true labels).
    ``resume``: restore the fold's ``last_state_<tag>`` snapshot and
    continue from the next epoch (same contract as the window families).
    ``mesh``: data-parallel trials — the TrainState and every stacked
    trial-group batch are placed over the mesh 'data' axis
    (parallel/mesh.py) and pjit inserts the grad all-reduce; numbers are
    identical to the single-device loop (the per-trial losses/grads are
    averaged either way). Used by the ``--trial-dp`` CLI flag; requires
    the plain per-epoch loop (fused_epoch off).
    """
    exp = exp or Experiment(cfg)
    average = "binary" if cfg.error_type == "global" else "macro"

    # trial-parallel and fused epochs both need every trial of the fold
    # padded to one common bucket so trials stack into fixed-shape batches
    G = cfg.trial_batch
    common_bucket = None
    if G > 1 or cfg.fused_epoch:
        from ..data.datasets import bucket_length

        max_t = max(t.n_frames for t in train_trials + test_trials)
        common_bucket = bucket_length(max_t, cap=cfg.max_frames)

    def make_batch(trial, split):
        gate = None
        if gates is not None:
            gate = gates[split].get(trial.name)
            if gate is None and cfg.error_type == "sequential":
                gate = (trial.labels_for("sequential") != 0).astype(np.float32)
        b = frame_batch(trial, cfg, bucket=common_bucket or 256, gate=gate)
        if exp.family == "tsvn":
            b["tecno_logits"] = np.zeros(
                (1, b["labels"].shape[0], cfg.out_features), np.float32
            )
        return b

    def make_group(trials_subset, split):
        """Stack <=G trial batches; short groups pad with zero-weight
        repeats of the first trial."""
        batches = [make_batch(t, split) for t in trials_subset]
        weights = [1.0] * len(batches)
        while len(batches) < G:
            batches.append(batches[0])
            weights.append(0.0)
        out = {
            k: np.stack([b[k] for b in batches])
            for k in batches[0]
            if not k.startswith("_")
        }
        out["trial_weight"] = np.asarray(weights, np.float32)
        return out

    if G > 1:
        sample = make_group(train_trials[:G], "train")
        sample_no_w = {k: v[0] for k, v in sample.items()
                       if k != "trial_weight"}
        state = exp.init_state(jax.random.key(cfg.seed), sample_no_w,
                               frozen=frozen)
    else:
        state = exp.init_state(
            jax.random.key(cfg.seed),
            _device_batch(make_batch(train_trials[0], "train")),
            frozen=frozen,
        )

    start_epoch = 0
    resume_path = (tracker.checkpoint_path(f"last_state_{tag}.npz")
                   if tracker and tag else None)
    if resume and resume_path and os.path.exists(resume_path):
        from .checkpoint import load_train_state

        state, start_epoch = load_train_state(resume_path, state)
        print(f"[{tag}] resumed at epoch {start_epoch}")

    if mesh is not None:
        from ..parallel.mesh import shard_state

        if cfg.fused_epoch or cfg.fused_run:
            raise ValueError("mesh trial-DP uses the per-epoch loop; set "
                             "fused_epoch/fused_run False")
        state = shard_state(state, mesh)

    # fused epochs: every trial stacked at the common bucket, one program
    # per epoch / one per eval pass (bit-exact vs the per-trial loop)
    fused = fused_eval = None
    if cfg.fused_epoch:
        from .fused import FusedFrameEpoch, FusedFrameEval

        train_batches = [make_batch(t, "train") for t in train_trials]
        test_batches = [make_batch(t, "test") for t in test_trials]
        if cfg.fused_run and start_epoch < cfg.n_epochs:
            return _train_frame_fold_fused_run(
                cfg, exp, state, test_trials, train_batches, test_batches,
                tracker, average, start_epoch=start_epoch,
                resume_path=resume_path)
        fused = FusedFrameEpoch(exp, cfg, train_batches)
        fused_eval = FusedFrameEval(exp, cfg, test_batches)
        fused_eval.host_batches = test_batches

    best, best_ckpt, history = None, None, []
    for epoch in range(start_epoch, cfg.n_epochs):
        state = state.replace(opt_state=set_lr(state.opt_state, epoch_lr(cfg, epoch)))
        t0 = time.time()
        if fused is not None:
            state, cms_stacked, losses_arr = fused.run_epoch(state, epoch)
            jax.block_until_ready(losses_arr)
            train_time = time.time() - t0
            cms = list(np.asarray(cms_stacked))
            losses = [float(l) for l in np.asarray(losses_arr)]
        else:
            order = np.random.default_rng(cfg.seed + epoch).permutation(
                len(train_trials))
            cms, losses = [], []
            from ..utils.prefetch import prefetch_to_device

            if G > 1:
                groups = [
                    make_group([train_trials[i] for i in order[s : s + G]], "train")
                    for s in range(0, len(order), G)
                ]
                batch_iter = iter(groups)
            else:
                batch_iter = (
                    _device_batch(make_batch(train_trials[i], "train"))
                    for i in order
                )
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch_iter = (shard_batch(b, mesh) for b in batch_iter)
            for batch in prefetch_to_device(batch_iter, depth=cfg.prefetch_depth):
                state, m = exp.train_step(state, batch)
                cms.append(m["cm"])
                losses.append(m["loss"])
            train_time = time.time() - t0
        train_m = _epoch_metrics([np.asarray(c) for c in cms], average,
                                 per_batch=False)
        train_loss = float(np.mean([float(l) for l in losses]))

        ev = evaluate_frame_fold(cfg, exp, state, test_trials, gates,
                                 common_bucket=common_bucket,
                                 fused_eval=fused_eval, mesh=mesh)
        row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "train_f1": train_m["f1"],
            "train_f1_weighted": train_m.get("f1_weighted", train_m["f1"]),
            "train_acc": train_m["accuracy"],
            "train_jaccard": train_m["jaccard"],
            "train_time": train_time,
            **{f"test_{k}": v for k, v in ev["metrics"].items()},
        }
        history.append(row)
        if tracker:
            tracker.log_metrics(
                {k: v for k, v in row.items() if np.isscalar(v)}, step=epoch
            )
        if _better(cfg, row, best):
            best = dict(row)
            best.update({k: ev[k] for k in
                         ("preds", "probs", "labels", "raw_labels", "gestures",
                          "subjects", "cm")})
            best_ckpt = jax.device_get(
                {"params": exp.params_tree(state.params),
                 "batch_stats": state.batch_stats,
                 "constants": state.constants}
            )
        if resume_path:
            from .checkpoint import save_train_state

            save_train_state(resume_path, state, epoch)

    return {"best": best, "history": history, "checkpoint": best_ckpt, "exp": exp}


def _train_frame_fold_fused_run(cfg, exp, state, test_trials, train_batches,
                                test_batches, tracker, average,
                                start_epoch=0, resume_path=None):
    """Whole-run fused path for the frame families (FusedFrameRun): every
    epoch's train scan + eval scan + on-device best selection in ONE device
    program, then identical host bookkeeping from the stacked results (see
    _train_window_fold_fused_run)."""
    from .fused import FusedFrameRun

    runner = FusedFrameRun(exp, cfg, train_batches, test_batches)
    E = cfg.n_epochs - start_epoch
    t0 = time.time()
    state, bckpt_dev, outs = runner.run(state, start_epoch, E)
    tcms, tlosses, preds_all, probs_all, ecms, elosses, scores = (
        np.asarray(jax.device_get(o)) for o in outs)
    wall = time.time() - t0
    # flat frame-family params -> tree at the checkpoint boundary
    best_ckpt = jax.device_get(
        {**bckpt_dev, "params": exp.params_tree(bckpt_dev["params"])})

    n_frames_total = sum(int(b["true_len"]) for b in test_batches)
    history = []
    best_i, degenerate = _fused_run_history(
        cfg, E, start_epoch, tcms, tlosses, ecms, elosses, scores, average,
        False, wall, "inference_ms_per_frame", n_frames_total, tracker,
        history)

    # rebuild the best epoch's per-trial prediction dump (evaluate_frame_fold
    # record() semantics: trim to true_len, collect labels/gestures/subjects)
    pe = preds_all[best_i]
    qe = probs_all[best_i]
    if runner.G > 1:  # (steps, G, T…) -> (steps*G, T…)
        pe = pe.reshape((-1,) + pe.shape[2:])
        qe = qe.reshape((-1,) + qe.shape[2:])
    preds, probs, labels, gests, subjects, raw_labels = [], [], [], [], [], []
    for trial, batch, prow, qrow in zip(test_trials, test_batches, pe, qe):
        T = int(batch["true_len"])
        preds.append(np.asarray(prow)[:T])
        probs.append(np.asarray(qrow)[:T])
        labels.append(batch["labels"][:T])
        gests.append(batch["_gestures"][:T])
        if trial.e_raw is not None:
            raw_labels.append(trial.e_raw[:T])
        subjects.extend([trial.name] * T)
    best = dict(history[best_i])
    best.update({
        "preds": np.concatenate(preds),
        "probs": np.concatenate(probs),
        "labels": np.concatenate(labels),
        "raw_labels": np.concatenate(raw_labels) if raw_labels else None,
        "gestures": np.concatenate(gests),
        "subjects": np.asarray(subjects, object),
        "cm": np.sum(ecms[best_i], axis=0),
    })
    if degenerate:
        best["all_epochs_non_finite"] = True
    if resume_path:
        from .checkpoint import save_train_state

        # the loader resumes at saved+1: record the last COMPLETED epoch
        save_train_state(resume_path, state, cfg.n_epochs - 1)
    return {"best": best, "history": history, "checkpoint": best_ckpt, "exp": exp}


def evaluate_frame_fold(cfg, exp, state, test_trials, gates=None,
                        common_bucket=None, fused_eval=None,
                        mesh=None) -> Dict:
    average = "binary" if cfg.error_type == "global" else "macro"
    preds, probs, labels, gests, subjects, cms, losses = [], [], [], [], [], [], []
    raw_labels = []
    t_infer, n_frames = 0.0, 0
    G = cfg.trial_batch

    def one_batch(trial):
        gate = None
        if gates is not None:
            gate = gates["test"].get(trial.name)
        b = frame_batch(trial, cfg, bucket=common_bucket or 256, gate=gate)
        if exp.family == "tsvn":
            b["tecno_logits"] = np.zeros(
                (1, b["labels"].shape[0], cfg.out_features), np.float32
            )
        return b

    def record(trial, batch, preds_row, probs_row):
        T = int(batch["true_len"])
        preds.append(np.asarray(preds_row)[:T])
        probs.append(np.asarray(probs_row)[:T])
        labels.append(batch["labels"][:T])
        gests.append(batch["_gestures"][:T])
        if trial.e_raw is not None:
            raw_labels.append(trial.e_raw[:T])
        subjects.extend([trial.name] * T)
        return T

    if fused_eval is not None:
        t0 = time.time()
        preds_arr, probs_arr, cms_arr, losses_arr = fused_eval.run(state)
        t_infer = time.time() - t0
        batches = getattr(fused_eval, "host_batches", None) or [
            one_batch(t) for t in test_trials
        ]
        for trial, batch, prow, qrow in zip(test_trials, batches,
                                            preds_arr, probs_arr):
            n_frames += record(trial, batch, prow, qrow)
        cms = [np.asarray(c) for c in cms_arr]
        losses = [float(l) for l in np.asarray(losses_arr)]
    elif G > 1:
        for s in range(0, len(test_trials), G):
            group = test_trials[s : s + G]
            batches = [one_batch(t) for t in group]
            weights = [1.0] * len(batches)
            while len(batches) < G:
                batches.append(batches[0])
                weights.append(0.0)
            stacked = {
                k: np.stack([b[k] for b in batches])
                for k in batches[0] if not k.startswith("_")
            }
            stacked["trial_weight"] = np.asarray(weights, np.float32)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                stacked = shard_batch(stacked, mesh)
            t0 = time.time()
            m = exp.eval_step(state, stacked)
            jax.block_until_ready(m["preds"])
            t_infer += time.time() - t0
            for gi, (trial, batch) in enumerate(zip(group, batches)):
                n_frames += record(trial, batch,
                                   np.asarray(m["preds"])[gi],
                                   np.asarray(m["probs"])[gi])
            cms.append(np.asarray(m["cm"]))
            losses.append(float(m["loss"]))
    else:
        for trial in test_trials:
            batch = one_batch(trial)
            dev_batch = _device_batch(batch)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                dev_batch = shard_batch(dev_batch, mesh)
            t0 = time.time()
            m = exp.eval_step(state, dev_batch)
            jax.block_until_ready(m["preds"])
            t_infer += time.time() - t0
            n_frames += record(trial, batch, m["preds"], m["probs"])
            cms.append(np.asarray(m["cm"]))
            losses.append(float(m["loss"]))
    pooled = _epoch_metrics(cms, average, per_batch=False)
    return {
        "metrics": {
            "loss": float(np.mean(losses)),
            "f1": pooled["f1"],
            "f1_weighted": pooled.get("f1_weighted", pooled["f1"]),
            "acc": pooled["accuracy"],
            "jaccard": pooled["jaccard"],
            "inference_ms_per_frame": t_infer / max(n_frames, 1) * 1e3,
        },
        "preds": np.concatenate(preds),
        "probs": np.concatenate(probs),
        "labels": np.concatenate(labels),
        "raw_labels": np.concatenate(raw_labels) if raw_labels else None,
        "gestures": np.concatenate(gests),
        "subjects": np.asarray(subjects, dtype=object),
        "cm": pooled["cm"],
    }
