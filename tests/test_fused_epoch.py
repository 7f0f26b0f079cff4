"""Fused on-device epoch == per-batch loop, exactly (same batches, same
dropout stream, same metrics)."""

import numpy as np
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import build_window_fold
from med_tpu.train.loop import train_window_fold
from tests.test_end_to_end import make_synth_fold


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
