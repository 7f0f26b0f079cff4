"""Mid-training resume: interrupting after epoch 0 and resuming must
reproduce uninterrupted training exactly (params, metrics, history)."""

import numpy as np
import pytest

from med_tpu.cli.common import base_parser, config_from_args, run_window_folds
from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import build_window_fold
from med_tpu.tracking import RunTracker
from med_tpu.train.checkpoint import load_train_state, save_train_state
from med_tpu.train.loop import train_window_fold
from tests.test_end_to_end import make_synth_fold

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


def test_resume_matches_uninterrupted(tmp_path, rng):
    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=3,
                           lr=1e-3)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)

    # uninterrupted 3-epoch run
    t_full = RunTracker(root=str(tmp_path / "r1"), experiment="t")
    full = train_window_fold(cfg, train_fold, test_fold, tracker=t_full,
                             tag="LOSO_1Out")

    # run only 1 epoch, then resume for the remaining 2
    t_part = RunTracker(root=str(tmp_path / "r2"), experiment="t")
    cfg1 = cfg.replace(n_epochs=1)
    part = train_window_fold(cfg1, train_fold, test_fold, tracker=t_part,
                             tag="LOSO_1Out")
    resumed = train_window_fold(cfg, train_fold, test_fold, tracker=t_part,
                                tag="LOSO_1Out", resume=True)

    assert len(resumed["history"]) == 2  # epochs 1 and 2 only
    for k in ("train_loss", "test_f1", "test_acc"):
        a = full["history"][2][k]
        b = resumed["history"][-1][k]
        assert a == pytest.approx(b, abs=1e-5), (k, a, b)


def test_frame_resume_matches_uninterrupted(tmp_path, rng):
    """Frame-family resume (TeCNo): run 1 epoch, resume for 2 more — the
    final epoch must match the uninterrupted 3-epoch run exactly."""
    from med_tpu.data.datasets import build_frame_fold
    from med_tpu.train.loop import train_frame_fold

    fold_dir = make_synth_fold(tmp_path, rng)
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, n_epochs=3, mstcn_layers=4,
        mstcn_f_maps=16, lr=1e-3, lr_scheduler=False,
    )
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")

    t_full = RunTracker(root=str(tmp_path / "rf1"), experiment="t")
    full = train_frame_fold(cfg, train_trials, test_trials, tracker=t_full,
                            tag="LOSO_1Out")

    t_part = RunTracker(root=str(tmp_path / "rf2"), experiment="t")
    cfg1 = cfg.replace(n_epochs=1)
    train_frame_fold(cfg1, train_trials, test_trials, tracker=t_part,
                     tag="LOSO_1Out")
    resumed = train_frame_fold(cfg, train_trials, test_trials, tracker=t_part,
                               tag="LOSO_1Out", resume=True)

    assert len(resumed["history"]) == 2  # epochs 1 and 2 only
    assert resumed["history"][0]["epoch"] == 1
    for k in ("train_loss", "test_f1", "test_acc"):
        a = full["history"][2][k]
        b = resumed["history"][-1][k]
        assert a == pytest.approx(b, abs=1e-5), (k, a, b)


def test_train_state_roundtrip(tmp_path, rng):
    import jax

    from med_tpu.train.engine import Experiment
    from tests.test_engine import synth_window_batch

    cfg = ExperimentConfig(model_name="SimpleLSTM")
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=8)
    state = exp.init_state(jax.random.key(0), batch)
    state, _ = exp.train_step(state, batch)

    path = str(tmp_path / "snap.npz")
    save_train_state(path, state, epoch=4)
    template = exp.init_state(jax.random.key(1), batch)
    restored, next_epoch = load_train_state(path, template)
    assert next_epoch == 5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is usable
    restored, m = exp.train_step(restored, batch)
    assert np.isfinite(float(m["loss"]))


def test_orbax_train_state_roundtrip(tmp_path, rng):
    """Orbax-backed snapshot (sharded-IO variant) restores exactly."""
    import jax
    import numpy as np

    from med_tpu.train.checkpoint import (
        load_train_state_orbax,
        save_train_state_orbax,
    )
    from med_tpu.train.engine import Experiment
    from tests.test_engine import synth_window_batch

    cfg = ExperimentConfig(model_name="SimpleCNN")
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=8)
    state = exp.init_state(jax.random.key(0), batch)
    state, _ = exp.train_step(state, batch)

    save_train_state_orbax(str(tmp_path / "ckpts"), state, epoch=4)
    template = exp.init_state(jax.random.key(1), batch)
    restored, next_epoch = load_train_state_orbax(
        str(tmp_path / "ckpts"), template)
    assert next_epoch == 5
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
