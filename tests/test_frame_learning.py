"""Frame-model convergence: TeCNo and COG reach high F1 on separable
synthetic trials through the full loss/metric stack."""

import numpy as np
import jax

from med_tpu.config import ExperimentConfig
from med_tpu.ops.metrics import metrics_from_cm
from med_tpu.train.engine import Experiment


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
