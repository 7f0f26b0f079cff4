"""Fused on-device epoch == per-batch loop, exactly (same batches, same
dropout stream, same metrics)."""

import numpy as np
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import build_window_fold
from med_tpu.train.loop import train_window_fold
from tests.test_end_to_end import make_synth_fold

pytestmark = pytest.mark.slow  # compile-heavy; skip via -m 'not slow'


@pytest.mark.parametrize("model", ["SimpleCNN", "SimpleLSTM"])
def test_fused_epoch_matches_per_batch(tmp_path, rng, model):
    fold_dir = make_synth_fold(tmp_path, rng)
    base = ExperimentConfig(model_name=model, batch_size=32, n_epochs=2,
                            lr=1e-3)
    train_fold, test_fold = build_window_fold(fold_dir, base)

    res_fused = train_window_fold(base.replace(fused_epoch=True),
                                  train_fold, test_fold)
    res_plain = train_window_fold(base.replace(fused_epoch=False),
                                  train_fold, test_fold)

    for a, b in zip(res_fused["history"], res_plain["history"]):
        assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-5)
        assert a["train_f1"] == pytest.approx(b["train_f1"], abs=1e-6)
        assert a["test_f1"] == pytest.approx(b["test_f1"], abs=1e-6)
    np.testing.assert_array_equal(res_fused["best"]["preds"],
                                  res_plain["best"]["preds"])


def test_fused_epoch_sequential_with_gate(tmp_path, rng):
    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=1,
                           error_type="sequential", out_features=5,
                           delete_ND=True)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)
    gate_tr = (train_fold.labels_for("sequential") != 0).astype(np.float32)
    gate_te = (test_fold.labels_for("sequential") != 0).astype(np.float32)
    extras = {"train": {"gate": gate_tr}, "test": {"gate": gate_te}}

    res_fused = train_window_fold(cfg.replace(fused_epoch=True),
                                  train_fold, test_fold, extras=extras)
    res_plain = train_window_fold(cfg.replace(fused_epoch=False),
                                  train_fold, test_fold, extras=extras)
    assert res_fused["history"][0]["train_loss"] == pytest.approx(
        res_plain["history"][0]["train_loss"], abs=1e-5
    )


def test_fused_epoch_matches_per_batch_custom_seed(tmp_path, rng):
    """Fused/per-batch parity must hold for non-default seeds too (the
    shuffle stream comes from cfg.seed in both paths)."""
    fold_dir = make_synth_fold(tmp_path, rng)
    base = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=2,
                            lr=1e-3, seed=7)
    train_fold, test_fold = build_window_fold(fold_dir, base)
    res_fused = train_window_fold(base.replace(fused_epoch=True),
                                  train_fold, test_fold)
    res_plain = train_window_fold(base.replace(fused_epoch=False),
                                  train_fold, test_fold)
    for a, b in zip(res_fused["history"], res_plain["history"]):
        assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-5)


def test_fused_epoch_es_six_class(tmp_path, rng):
    """Fused path parity for the 6-class ES regime (multi-class probs)."""
    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(model_name="SimpleLSTM", batch_size=32, n_epochs=1,
                           error_type="all_errors", out_features=6,
                           delete_ND=True)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)
    res_fused = train_window_fold(cfg.replace(fused_epoch=True),
                                  train_fold, test_fold)
    res_plain = train_window_fold(cfg.replace(fused_epoch=False),
                                  train_fold, test_fold)
    a, b = res_fused["history"][0], res_plain["history"][0]
    assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-5)
    assert a["test_f1"] == pytest.approx(b["test_f1"], abs=1e-6)
    assert res_fused["best"]["probs"].shape[-1] == 6


def test_fused_siamese_epoch_matches_per_batch(tmp_path, rng):
    """Siamese pair training through the fused scan == the per-batch loop
    (same pair schedule, same vote)."""
    from med_tpu.cli.train_window import _siamese_data_fn

    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(model_name="Siamese_CNN", batch_size=32,
                           n_epochs=2, lr=1e-3, error_type="global",
                           out_features=1, siamese=True, n_pairs=96,
                           n_comparisons=3)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)
    sdata = _siamese_data_fn(cfg)("1Out", train_fold, test_fold)

    res_f = train_window_fold(cfg.replace(fused_epoch=True),
                              train_fold, test_fold, siamese_data=sdata)
    res_p = train_window_fold(cfg.replace(fused_epoch=False),
                              train_fold, test_fold, siamese_data=sdata)
    # same pair schedule + step math; scan-vs-dispatch compilation introduces
    # float-level grad noise that Adam+BN amplify over steps, so epoch 0 is
    # tight and epoch 1 tolerances are looser
    a0, b0 = res_f["history"][0], res_p["history"][0]
    assert a0["train_loss"] == pytest.approx(b0["train_loss"], abs=1e-4)
    assert a0["test_f1"] == pytest.approx(b0["test_f1"], abs=1e-6)
    a1, b1 = res_f["history"][1], res_p["history"][1]
    assert a1["train_loss"] == pytest.approx(b1["train_loss"], abs=5e-3)
    # the siamese eval cm is the majority-vote CM over test positions
    assert res_f["best"]["cm"].shape == (2, 2)
    assert res_f["best"]["cm"].sum() == res_p["best"]["cm"].sum()


def test_fused_siamese_run_matches_fused_epochs(tmp_path, rng):
    """FusedSiameseRun (whole siamese run + on-device VOTE-F1 selection in
    one program) == the per-epoch fused loop: history (incl. vote metrics),
    best epoch, predictions, vote CM, checkpoint."""
    import jax
    from med_tpu.cli.train_window import _siamese_data_fn

    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(model_name="Siamese_CNN", batch_size=32,
                           n_epochs=3, lr=1e-3, error_type="global",
                           out_features=1, siamese=True, n_pairs=96,
                           n_comparisons=3, lr_scheduler=True)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)
    sdata = _siamese_data_fn(cfg)("1Out", train_fold, test_fold)

    res_run = train_window_fold(cfg.replace(fused_run=True),
                                train_fold, test_fold, siamese_data=sdata)
    res_ep = train_window_fold(cfg.replace(fused_run=False),
                               train_fold, test_fold, siamese_data=sdata)
    assert len(res_run["history"]) == len(res_ep["history"]) == 3
    for a, b in zip(res_run["history"], res_ep["history"]):
        for k in ("train_loss", "test_loss", "train_f1", "test_f1",
                  "test_f1_weighted", "test_acc", "test_jaccard"):
            assert a[k] == pytest.approx(b[k], abs=1e-5), k
    assert res_run["best"]["epoch"] == res_ep["best"]["epoch"]
    np.testing.assert_array_equal(res_run["best"]["preds"],
                                  res_ep["best"]["preds"])
    np.testing.assert_array_equal(res_run["best"]["cm"], res_ep["best"]["cm"])
    for a, b in zip(jax.tree_util.tree_leaves(res_run["checkpoint"]),
                    jax.tree_util.tree_leaves(res_ep["checkpoint"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_run_matches_fused_epochs(tmp_path, rng):
    """Whole-run fusion (all epochs + evals + best selection in ONE program)
    reproduces the per-epoch fused loop: same history, same best epoch, same
    predictions, same winning checkpoint."""
    import jax

    fold_dir = make_synth_fold(tmp_path, rng)
    base = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=3,
                            lr=1e-3, lr_scheduler=True)
    train_fold, test_fold = build_window_fold(fold_dir, base)

    res_run = train_window_fold(base.replace(fused_run=True),
                                train_fold, test_fold)
    res_ep = train_window_fold(base.replace(fused_run=False),
                               train_fold, test_fold)

    assert len(res_run["history"]) == len(res_ep["history"]) == 3
    for a, b in zip(res_run["history"], res_ep["history"]):
        for k in ("train_loss", "test_loss", "train_f1", "test_f1",
                  "test_f1_weighted", "test_acc", "test_jaccard"):
            assert a[k] == pytest.approx(b[k], abs=1e-5), k
    assert res_run["best"]["epoch"] == res_ep["best"]["epoch"]
    np.testing.assert_array_equal(res_run["best"]["preds"],
                                  res_ep["best"]["preds"])
    np.testing.assert_allclose(res_run["best"]["probs"],
                               res_ep["best"]["probs"], atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(res_run["checkpoint"]),
                    jax.tree_util.tree_leaves(res_ep["checkpoint"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_run_loss_mode_with_bucketing(tmp_path, rng):
    """loss_or_f1='loss' selection with a non-default fold_pad_quantum:
    the whole-run device score must be the masked mean over the REAL eval
    steps (surplus bucket steps carry garbage losses), so the fused run
    picks the same best epoch — with the same test_loss stream — as the
    per-epoch loop."""
    fold_dir = make_synth_fold(tmp_path, rng)
    base = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=3,
                            lr=1e-3, lr_scheduler=True, loss_or_f1="loss",
                            fold_pad_quantum=512)
    train_fold, test_fold = build_window_fold(fold_dir, base)
    # the quantum must actually create surplus (fully-masked) eval steps
    assert len(test_fold) % 512 != 0 and len(test_fold) < 512

    res_run = train_window_fold(base.replace(fused_run=True),
                                train_fold, test_fold)
    res_ep = train_window_fold(
        base.replace(fused_run=False, fold_pad_quantum=0),
        train_fold, test_fold)

    assert len(res_run["history"]) == len(res_ep["history"]) == 3
    for a, b in zip(res_run["history"], res_ep["history"]):
        assert a["test_loss"] == pytest.approx(b["test_loss"], abs=1e-5)
    assert res_run["best"]["epoch"] == res_ep["best"]["epoch"]
    np.testing.assert_array_equal(res_run["best"]["preds"],
                                  res_ep["best"]["preds"])


def test_fold_bucketing_shares_one_compiled_program(tmp_path, rng):
    """Two folds of different window counts inside the same
    fold_pad_quantum bucket reuse ONE compiled whole-run executable (the
    shared-Experiment jit wrapper sees identical shapes), and the surplus
    fully-masked steps leave the results equal to the unbucketed run."""
    import jax
    from med_tpu.train.engine import Experiment
    from med_tpu.train.fused import FusedWindowRun

    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=2,
                           lr=1e-3, fold_pad_quantum=512, use_pallas=False)
    folds = []
    for i, frames in enumerate((160, 200)):
        root = tmp_path / f"f{i}"
        root.mkdir()
        folds.append(build_window_fold(
            make_synth_fold(root, rng, frames_per_trial=frames), cfg))
    assert len(folds[0][0]) != len(folds[1][0])

    exp = Experiment(cfg)
    runners = [FusedWindowRun(exp, cfg, tf, ef) for tf, ef in folds]
    assert runners[0]._fn is runners[1]._fn  # shared jit wrapper
    results = []
    for (tf, ef), r in zip(folds, runners):
        state = exp.init_state(
            jax.random.key(cfg.seed),
            {"images": tf.images[:32], "kinematics": tf.kinematics[:32],
             "labels": tf.labels_for(cfg.error_type)[:32],
             "mask": np.ones(32, np.float32)})
        results.append(r.run(state, 0, cfg.n_epochs))
    # one executable serves both folds
    assert runners[0]._fn._cache_size() == 1

    # bucketed == unbucketed, per fold
    cfg0 = cfg.replace(fold_pad_quantum=0)
    for (tf, ef), (_, _, outs) in zip(folds, results):
        res = train_window_fold(cfg0, tf, ef)
        scores = np.asarray(outs[-1])
        for e, row in enumerate(res["history"]):
            assert float(scores[e]) == pytest.approx(
                row.get("test_f1_weighted", row["test_f1"]), abs=1e-5)


# ----------------------------------------------------------- frame families
def _frame_cfg(**kw):
    base = dict(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        n_epochs=2, lr=1e-3, lr_scheduler=False, weight_decay=0.0,
    )
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.mark.parametrize("trial_batch", [1, 2])
def test_fused_frame_epoch_matches_per_trial(tmp_path, rng, trial_batch):
    """FusedFrameEpoch/Eval == the per-trial dispatch loop exactly (same
    shuffle, same rng stream, same masked losses, same predictions)."""
    from med_tpu.data.datasets import build_frame_fold
    from med_tpu.train.loop import train_frame_fold

    fold_dir = make_synth_fold(tmp_path, rng, n_trials=5, frames_per_trial=150)
    cfg = _frame_cfg(trial_batch=trial_batch)
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")

    res_f = train_frame_fold(cfg.replace(fused_epoch=True),
                             train_trials, test_trials)
    res_p = train_frame_fold(cfg.replace(fused_epoch=False),
                             train_trials, test_trials)
    for a, b in zip(res_f["history"], res_p["history"]):
        assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-5)
        assert a["test_f1"] == pytest.approx(b["test_f1"], abs=1e-6)
        assert a["test_loss"] == pytest.approx(b["test_loss"], abs=1e-5)
    np.testing.assert_array_equal(res_f["best"]["preds"],
                                  res_p["best"]["preds"])
    np.testing.assert_array_equal(res_f["best"]["cm"], res_p["best"]["cm"])


def test_fused_frame_run_matches_fused_epochs(tmp_path, rng):
    """FusedFrameRun (whole run in one program) == the per-epoch fused
    loop: history, best epoch, predictions, checkpoint."""
    import jax
    from med_tpu.data.datasets import build_frame_fold
    from med_tpu.train.loop import train_frame_fold

    fold_dir = make_synth_fold(tmp_path, rng, n_trials=5, frames_per_trial=150)
    cfg = _frame_cfg(n_epochs=3, lr_scheduler=True)
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")

    res_run = train_frame_fold(cfg.replace(fused_run=True),
                               train_trials, test_trials)
    res_ep = train_frame_fold(cfg.replace(fused_run=False),
                              train_trials, test_trials)
    assert len(res_run["history"]) == len(res_ep["history"]) == 3
    for a, b in zip(res_run["history"], res_ep["history"]):
        for k in ("train_loss", "test_loss", "train_f1", "test_f1",
                  "test_f1_weighted", "test_acc", "test_jaccard"):
            assert a[k] == pytest.approx(b[k], abs=1e-5), k
    assert res_run["best"]["epoch"] == res_ep["best"]["epoch"]
    np.testing.assert_array_equal(res_run["best"]["preds"],
                                  res_ep["best"]["preds"])
    np.testing.assert_array_equal(res_run["best"]["gestures"],
                                  res_ep["best"]["gestures"])
    np.testing.assert_array_equal(res_run["best"]["subjects"],
                                  res_ep["best"]["subjects"])
    for a, b in zip(jax.tree_util.tree_leaves(res_run["checkpoint"]),
                    jax.tree_util.tree_leaves(res_ep["checkpoint"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_frame_epoch_cog(tmp_path, rng):
    """COG (multi-track loss, constants, fast-path pooling) through the
    fused frame path."""
    from med_tpu.data.datasets import build_frame_fold
    from med_tpu.train.loop import train_frame_fold

    fold_dir = make_synth_fold(tmp_path, rng, n_trials=4, frames_per_trial=140)
    cfg = _frame_cfg(
        model_name="COG", num_layers_Basic=2, num_layers_R=2, num_R=1,
        mstcn_stages=3, d_model=16, d_q=2, sequence_length=6,
        use_pallas=False, n_epochs=1,
    )
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")
    res_f = train_frame_fold(cfg.replace(fused_epoch=True),
                             train_trials, test_trials)
    res_p = train_frame_fold(cfg.replace(fused_epoch=False),
                             train_trials, test_trials)
    a, b = res_f["history"][0], res_p["history"][0]
    assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-5)
    assert a["test_f1"] == pytest.approx(b["test_f1"], abs=1e-6)
    np.testing.assert_array_equal(res_f["best"]["preds"],
                                  res_p["best"]["preds"])
