"""End-to-end pipeline tests on a synthetic on-disk fold: trial files ->
fold building -> windowing -> training loop -> best checkpoint -> rollup ->
summary -> ensemble."""

import os

import numpy as np
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import build_frame_fold, build_window_fold
from med_tpu.data.trials import (
    Trial,
    compute_fold_stats,
    load_fold,
    save_fold_stats,
    save_trial_npz,
)
from med_tpu.eval.ensemble import cascade_ensemble, score_predictions, soft_vote
from med_tpu.eval.rollup import compute_window_metrics
from med_tpu.eval.summary import create_summary
from med_tpu.tracking import RunTracker
from med_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from med_tpu.train.loop import train_frame_fold, train_window_fold

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


def make_synth_fold(tmp_path, rng, n_trials=4, frames_per_trial=160):
    """Synthetic JIGSAWS-like fold with a learnable kinematics signal."""
    fold = tmp_path / "fold"
    fold.mkdir()
    names = []
    for i in range(n_trials):
        letter = "BCDE"[i % 4]
        name = f"Needle_Passing_{letter}00{i + 1}"
        names.append(name + ".npz")
        T = frames_per_trial
        g = np.repeat(rng.integers(1, 6, T // 20 + 1), 20)[:T]
        e = np.zeros((T, 5), np.int64)
        err_frames = rng.random(T) < 0.4
        e[err_frames, 4] = 1
        which = rng.integers(0, 4, T)
        for t in np.flatnonzero(err_frames):
            e[t, which[t]] = 1
        img = rng.normal(size=(T, 2048)).astype(np.float32)
        kin = rng.normal(size=(T, 26)).astype(np.float32)
        kin += e[:, 4:5] * 2.0  # learnable signal
        save_trial_npz(str(fold / names[-1]), Trial(name, img, kin, g, e))
    with open(fold / "train.csv", "w") as f:
        f.write("\n".join(names[:-1]))
    with open(fold / "test.csv", "w") as f:
        f.write(names[-1])
    img, kin, _, _, _ = load_fold(str(fold), "train.csv")
    save_fold_stats(str(fold), compute_fold_stats(img, kin))
    return str(fold)


@pytest.fixture
def synth_fold(tmp_path, rng):
    return make_synth_fold(tmp_path, rng)


def test_build_window_fold(synth_fold, rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=2)
    train_fold, test_fold = build_window_fold(synth_fold, cfg)
    assert len(train_fold) > 20
    assert train_fold.images.shape[1:] == (10, 2048)
    assert train_fold.e_powerset.shape[1] == 7
    # standardized features
    assert abs(train_fold.images.mean()) < 0.3
    b = train_fold.binary_error_distribution
    assert 0 < b[1] < 1


def test_window_training_end_to_end(synth_fold, tmp_path, rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=2,
                           lr=1e-3)
    train_fold, test_fold = build_window_fold(synth_fold, cfg)
    tracker = RunTracker(root=str(tmp_path / "runs"), experiment="t")
    res = train_window_fold(cfg, train_fold, test_fold, tracker=tracker)
    assert len(res["history"]) == 2
    best = res["best"]
    assert 0 <= best["test_f1"] <= 1
    assert len(best["preds"]) == len(test_fold)
    assert best["cm"].sum() == len(test_fold)
    # tracker wrote metrics
    assert os.path.exists(os.path.join(tracker.dir, "metrics.jsonl"))

    # checkpoint roundtrip
    ck_path = tracker.checkpoint_path("best_model_LOSO_1Out.npz")
    save_checkpoint(ck_path, res["checkpoint"]["params"],
                    res["checkpoint"]["batch_stats"], meta={"cfg": cfg.to_dict()})
    loaded = load_checkpoint(ck_path)
    import jax

    orig_leaves = jax.tree.leaves(res["checkpoint"]["params"])
    new_leaves = jax.tree.leaves(loaded["params"])
    assert len(orig_leaves) == len(new_leaves)
    np.testing.assert_allclose(np.asarray(orig_leaves[0]), new_leaves[0])


def test_frame_training_and_rollup(synth_fold, rng):
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, n_epochs=2, mstcn_layers=4,
        mstcn_f_maps=16, lr=1e-3, lr_scheduler=False,
    )
    train_trials = build_frame_fold(synth_fold, cfg, "train.csv")
    test_trials = build_frame_fold(synth_fold, cfg, "test.csv")
    assert train_trials[0].skill.shape[1] == 3
    res = train_frame_fold(cfg, train_trials, test_trials)
    best = res["best"]
    n_test_frames = sum(t.n_frames for t in test_trials)
    assert len(best["preds"]) == n_test_frames

    # frame -> window rollup across "folds"
    dumps = {"1Out": {k: best[k] for k in ("preds", "labels", "gestures", "subjects")}}
    summary, cm = compute_window_metrics(dumps, window_size=10, stride=6)
    assert "±" in summary["F1"]
    assert cm.sum() > 0


def test_summary_and_ensembles(rng):
    fold_results = {
        "1Out": {"train_f1": 0.8, "train_acc": 0.8, "train_jaccard": 0.7,
                 "test_f1": 0.7, "test_acc": 0.72, "test_jaccard": 0.6,
                 "train_time": 1.0, "test_inference_ms": 0.5},
        "2Out": {"train_f1": 0.9, "train_acc": 0.85, "train_jaccard": 0.75,
                 "test_f1": 0.75, "test_acc": 0.74, "test_jaccard": 0.62,
                 "train_time": 1.2, "test_inference_ms": 0.6},
    }
    s = create_summary(fold_results, {"1Out": 100, "2Out": 300},
                       {"1Out": 50, "2Out": 150})
    # weighted mean: (0.7*50 + 0.75*150)/200 = 0.7375
    assert s["Test"]["F1"].startswith("0.737") or s["Test"]["F1"].startswith("0.738")

    probs_a = rng.random(100)
    probs_b = rng.random(100)
    votes, p = soft_vote(probs_a, probs_b)
    np.testing.assert_array_equal(votes, ((probs_a + probs_b) / 2 >= 0.5).astype(int))

    b = rng.integers(0, 2, 100)
    mc = rng.integers(1, 6, 100)
    casc = cascade_ensemble(b, mc)
    assert (casc[b == 0] == 0).all()
    assert (casc[b == 1] == mc[b == 1]).all()
    m, cm = score_predictions(rng.integers(0, 6, 100), casc, 6, "macro")
    assert 0 <= m["f1"] <= 1


def test_reconcile_nd_matches_reference_mask_surgery(rng):
    """reconcile_nd reproduces the reference's mask_position_ND_* surgery
    (ensemble.ipynb cell 15 "Pre i-iv"): the delete_ND=False binary run's
    ND-only rows are dropped so it lands on the delete_ND=True multiclass
    run's row set, per-subject."""
    from med_tpu.data.labels import powerset_error_labels
    from med_tpu.eval.ensemble import reconcile_nd

    n = 120
    subjects = np.array(["B001"] * 40 + ["C005"] * 40 + ["D001"] * 40)
    raw = np.zeros((n, 5), np.int64)
    # sprinkle generic errors everywhere
    err_rows = rng.random(n) < 0.5
    raw[err_rows, 4] = 1
    raw[err_rows & (rng.random(n) < 0.5), 0] = 1  # OOV
    # ND-only rows confined to ONE subject (the reference's one mask file)
    nd_rows = np.zeros(n, bool)
    nd_rows[45:55] = True
    raw[nd_rows] = 0
    raw[nd_rows, 1] = 1  # ND flag (labels.py column order OOV,ND,MA,NP,ERR)
    raw[nd_rows, 4] = 1  # error flag
    labels_bin = (raw[:, 4] == 1).astype(int)
    preds_bin = rng.integers(0, 2, n)
    probs_bin = rng.random(n)

    # the multiclass (delete_ND=True) run saw only the surviving rows
    _, nd_mask = powerset_error_labels(raw, delete_ND=True)
    assert nd_mask.sum() == 10 and (subjects[nd_mask] == "C005").all()
    keep = ~nd_mask
    preds_mc = rng.integers(0, 6, int(keep.sum()))

    dump_bin = {"preds": preds_bin, "probs": probs_bin, "labels": labels_bin,
                "raw_labels": raw, "subjects": subjects,
                "gestures": np.ones(n, np.int64)}
    dump_mc = {"preds": preds_mc}
    rec = reconcile_nd(dump_bin, dump_mc)

    # literal notebook oracle: expand the subject's saved mask over the
    # subject's indices, then delete those positions from the binary arrays
    mask_position_ND = nd_mask[subjects == "C005"]  # the .pth payload
    subject_indices_ND = np.where(subjects == "C005")[0]
    expanded = np.zeros(n, bool)
    expanded[subject_indices_ND] = mask_position_ND
    np.testing.assert_array_equal(rec["preds"], preds_bin[~expanded])
    np.testing.assert_array_equal(rec["labels"],
                                  np.asarray(labels_bin)[~expanded])
    np.testing.assert_array_equal(rec["subjects"], subjects[~expanded])
    assert len(rec["preds"]) == len(preds_mc)

    # length-mismatch after filtering raises instead of silently fusing
    import pytest as _pytest
    with _pytest.raises(ValueError):
        reconcile_nd(dump_bin, {"preds": preds_mc[:-1]})
    with _pytest.raises(ValueError):
        reconcile_nd({"preds": preds_bin}, dump_mc)
