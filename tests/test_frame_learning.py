"""Frame-model convergence: TeCNo and COG reach high F1 on separable
synthetic trials through the full loss/metric stack."""

import numpy as np
import jax
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.ops.metrics import metrics_from_cm
from med_tpu.train.engine import Experiment

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


def separable_frame_batch(rng, cfg, T=192, Tpad=256):
    labels = np.zeros(Tpad, np.int64)
    # block-structured errors (like gesture-level annotations)
    t = 0
    while t < T:
        run = int(rng.integers(10, 30))
        labels[t : min(t + run, T)] = int(rng.integers(0, 2))
        t += run
    kin = rng.normal(size=(1, Tpad, 26)).astype(np.float32)
    kin[0, :, :5] += labels[:, None] * 2.0
    mask = np.zeros(Tpad, np.float32)
    mask[:T] = 1
    return {
        "images": rng.normal(size=(1, Tpad, 2048)).astype(np.float32),
        "kinematics": kin,
        "labels": labels,
        "mask": mask,
        "true_len": np.asarray(T, np.int32),
    }


def run_epochs(exp, batches, n_steps=40):
    state = exp.init_state(jax.random.key(0), batches[0])
    m = None
    for step in range(n_steps):
        state, m = exp.train_step(state, batches[step % len(batches)])
    return state, m


def test_tecno_learns(rng):
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=5, mstcn_f_maps=32,
        lr=2e-3, lr_scheduler=False, weight_decay=0.0,
    )
    exp = Experiment(cfg)
    batches = [separable_frame_batch(rng, cfg) for _ in range(3)]
    state, _ = run_epochs(exp, batches)
    ev = exp.eval_step(state, batches[0])
    m = metrics_from_cm(np.asarray(ev["cm"]), "binary")
    assert m["accuracy"] > 0.85, m


def test_cog_learns(rng):
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=False,
        num_layers_Basic=4, num_layers_R=3, num_R=1, mstcn_stages=3,
        d_model=16, d_q=2, sequence_length=8, lr=2e-3, lr_scheduler=False,
        weight_decay=0.0,
    )
    exp = Experiment(cfg)
    batches = [separable_frame_batch(rng, cfg) for _ in range(3)]
    state, _ = run_epochs(exp, batches, n_steps=50)
    ev = exp.eval_step(state, batches[0])
    m = metrics_from_cm(np.asarray(ev["cm"]), "binary")
    assert m["accuracy"] > 0.8, m


def test_trial_parallel_matches_single_trial_eval(rng, tmp_path):
    """trial_batch>1 eval loss equals the weighted mean of per-trial losses,
    and training runs end-to-end with averaged gradients."""
    from med_tpu.data.datasets import build_frame_fold
    from med_tpu.train.loop import train_frame_fold
    from tests.test_end_to_end import make_synth_fold

    fold_dir = make_synth_fold(tmp_path, rng, n_trials=5, frames_per_trial=150)
    base = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        n_epochs=2, lr=1e-3, lr_scheduler=False, weight_decay=0.0,
    )
    train_trials = build_frame_fold(fold_dir, base, "train.csv")
    test_trials = build_frame_fold(fold_dir, base, "test.csv")

    res1 = train_frame_fold(base, train_trials, test_trials)
    res2 = train_frame_fold(base.replace(trial_batch=2), train_trials,
                            test_trials)
    # same prediction-dump shape and sane metrics under the batched regime
    assert len(res2["best"]["preds"]) == len(res1["best"]["preds"])
    assert np.isfinite(res2["history"][0]["train_loss"])
    assert res2["best"]["cm"].sum() == res1["best"]["cm"].sum()

    # eval-mode loss of a 2-trial group == mean of the two per-trial losses
    from med_tpu.data.datasets import bucket_length, frame_batch
    from med_tpu.train.engine import Experiment
    import jax

    bucket = bucket_length(max(t.n_frames for t in train_trials + test_trials))
    exp1 = Experiment(base)
    expG = Experiment(base.replace(trial_batch=2))
    b0 = frame_batch(train_trials[0], base, bucket=bucket)
    b1 = frame_batch(train_trials[1], base, bucket=bucket)
    b0 = {k: v for k, v in b0.items() if not k.startswith("_")}
    b1 = {k: v for k, v in b1.items() if not k.startswith("_")}
    state = exp1.init_state(jax.random.key(0), b0)
    l0 = float(exp1.eval_step(state, b0)["loss"])
    l1 = float(exp1.eval_step(state, b1)["loss"])
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    stacked["trial_weight"] = np.ones(2, np.float32)
    stateG = expG.init_state(jax.random.key(0), b0, frozen=None)
    stateG = stateG.replace(params=state.params,
                            batch_stats=state.batch_stats)
    lg = float(expG.eval_step(stateG, stacked)["loss"])
    assert lg == pytest.approx((l0 + l1) / 2, rel=1e-5)
