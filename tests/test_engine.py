"""Training-engine smoke + learning tests on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.train.engine import Experiment
from med_tpu.train.optim import epoch_lr, set_lr
from med_tpu.ops.metrics import metrics_from_cm


def synth_window_batch(rng, cfg, B=64, n_classes=2, seed_signal=True):
    W = cfg.window_size
    images = rng.normal(size=(B, W, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, W, 26)).astype(np.float32)
    labels = rng.integers(0, n_classes, B)
    if seed_signal:  # make the task learnable: shift kinematics by label
        kin += labels[:, None, None] * 1.5
    return {
        "images": jnp.asarray(images),
        "kinematics": jnp.asarray(kin),
        "labels": jnp.asarray(labels),
        "mask": jnp.ones(B, jnp.float32),
    }


def test_window_binary_learns(rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", n_epochs=3, lr=1e-3)
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg)
    state = exp.init_state(jax.random.key(0), batch)
    first_loss = None
    for i in range(30):
        state, metrics = exp.train_step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss * 0.7
    m = metrics_from_cm(np.asarray(metrics["cm"]), "binary")
    assert m["accuracy"] > 0.8
    ev = exp.eval_step(state, batch)
    assert ev["preds"].shape == (64,)


def test_window_mask_excludes_padding(rng):
    cfg = ExperimentConfig(model_name="SimpleCNN")
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=8)
    batch["mask"] = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    state = exp.init_state(jax.random.key(0), batch)
    ev = exp.eval_step(state, batch)
    assert int(np.asarray(ev["cm"]).sum()) == 4


@pytest.mark.slow
def test_window_es_six_class(rng):
    cfg = ExperimentConfig(
        model_name="SimpleLSTM", error_type="all_errors", out_features=6,
        lr=1e-3,
    )
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=48, n_classes=6)
    state = exp.init_state(jax.random.key(0), batch)
    for _ in range(25):
        state, metrics = exp.train_step(state, batch)
    assert "cm_binary" in metrics
    assert np.asarray(metrics["cm"]).shape == (6, 6)
    m = metrics_from_cm(np.asarray(metrics["cm"]), "macro")
    assert m["accuracy"] > 0.5


def test_window_sequential_masked(rng):
    cfg = ExperimentConfig(
        model_name="SimpleCNN", error_type="sequential", out_features=5,
    )
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=32, n_classes=6)
    state = exp.init_state(jax.random.key(0), batch)
    state, metrics = exp.train_step(state, batch)
    # specific CM counts only true-error examples
    n_err = int((np.asarray(batch["labels"]) != 0).sum())
    assert int(np.asarray(metrics["cm_specific"]).sum()) == n_err


def test_siamese_pairs(rng):
    cfg = ExperimentConfig(model_name="Siamese_CNN", siamese=True)
    exp = Experiment(cfg)
    B, W = 16, cfg.window_size
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, 2, W, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(B, 2, W, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, B)),
        "mask": jnp.ones(B, jnp.float32),
    }
    state = exp.init_state(jax.random.key(0), batch)
    state, metrics = exp.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.asarray(metrics["cm"]).shape == (2, 2)


def frame_batch(rng, cfg, T=100, Tpad=128, n_classes=2):
    x = rng.normal(size=(1, Tpad, cfg.in_features())).astype(np.float32)
    labels = rng.integers(0, n_classes, Tpad)
    labels[T:] = 0
    mask = np.zeros(Tpad, np.float32)
    mask[:T] = 1
    return {
        "images": jnp.asarray(rng.normal(size=(1, Tpad, 2048)), jnp.float32),
        "kinematics": jnp.asarray(x[..., :26] if cfg.data_type == "kinematics" else rng.normal(size=(1, Tpad, 26)), jnp.float32),
        "labels": jnp.asarray(labels),
        "mask": jnp.asarray(mask),
        "true_len": jnp.asarray(T, jnp.int32),
    }


def test_tecno_frame(rng):
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=4, mstcn_f_maps=16,
    )
    exp = Experiment(cfg)
    batch = frame_batch(rng, cfg)
    state = exp.init_state(jax.random.key(0), batch)
    state, metrics = exp.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # CM counts only valid frames
    assert int(np.asarray(metrics["cm"]).sum()) == 100


@pytest.mark.slow
def test_tsvn_frozen_tecno(rng):
    tecno_cfg = dict(num_stages=2, num_layers=3, f_maps=8, in_dim=26,
                     out_classes=2, causal=True)
    from med_tpu.models.tcn import TeCNo

    tecno = TeCNo(**tecno_cfg)
    tp = tecno.init({"params": jax.random.key(5)},
                    jnp.zeros((1, 64, 26)), train=False)["params"]

    cfg = ExperimentConfig(
        model_name="TransSVNet", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_f_maps=8, mstcn_stages=2,
        mstcn_layers=3, sequence_length=6,
    )
    exp = Experiment(cfg)
    batch = frame_batch(rng, cfg, T=50, Tpad=64)
    batch["tecno_logits"] = jnp.zeros((1, 64, 2))  # init-shape only
    frozen = {"tecno_params": tp}
    state = exp.init_state(jax.random.key(0), batch, frozen=frozen)
    p_before = jax.tree.leaves(state.frozen["tecno_params"])[0].copy()
    state, metrics = exp.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # frozen TeCNo params untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.frozen["tecno_params"])[0]), np.asarray(p_before)
    )


@pytest.mark.slow
def test_cog_frame_binary(rng):
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=False,
        num_layers_Basic=3, num_layers_R=2, num_R=1, mstcn_stages=3,
        d_model=16, d_q=2, sequence_length=6,
    )
    exp = Experiment(cfg)
    batch = frame_batch(rng, cfg, T=90, Tpad=128)
    state = exp.init_state(jax.random.key(0), batch)
    state, metrics = exp.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    ev = exp.eval_step(state, batch)
    assert ev["preds"].shape == (128,)


@pytest.mark.slow
def test_cog_sequential_gate(rng):
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        error_type="sequential", out_features=5, batch_size=1,
        use_pallas=False, num_layers_Basic=3, num_layers_R=2, num_R=1,
        mstcn_stages=3, d_model=16, d_q=2, sequence_length=6,
    )
    exp = Experiment(cfg)
    batch = frame_batch(rng, cfg, T=90, Tpad=128, n_classes=6)
    batch["gate"] = (batch["labels"] != 0).astype(jnp.float32)
    state = exp.init_state(jax.random.key(0), batch)
    state, metrics = exp.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.asarray(metrics["cm_specific"]).shape == (5, 5)


def test_cosine_lr_schedule():
    cfg = ExperimentConfig(n_epochs=10, lr=1e-3, lr_scheduler=True)
    assert epoch_lr(cfg, 0) == pytest.approx(1e-3)
    assert epoch_lr(cfg, 10) == pytest.approx(1e-6)
    assert epoch_lr(cfg, 5) == pytest.approx((1e-3 + 1e-6) / 2)
    cfg2 = cfg.replace(lr_scheduler=False)
    assert epoch_lr(cfg2, 7) == 1e-3


def test_set_lr_changes_updates(rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", lr=1e-3)
    exp = Experiment(cfg)
    batch = synth_window_batch(rng, cfg, B=8)
    state = exp.init_state(jax.random.key(0), batch)
    state = state.replace(opt_state=set_lr(state.opt_state, 0.0))
    p_before = jax.tree.leaves(state.params)[0].copy()
    state, _ = exp.train_step(state, batch)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p_before), atol=1e-8
    )


def test_es_class_weight_scale():
    """train_window_ES.ipynb cell 2: inverse-freq weights of powerset
    classes 1/3/4/5 divided by 1.5 when pos_weight is on; 0/2 untouched."""
    from med_tpu.train.loop import _class_counts

    class FakeFold:
        specific_error_distribution = [10.0, 30.0, 5.0, 60.0, 90.0, 120.0]
        binary_error_distribution = [3.0, 7.0]

    cfg = ExperimentConfig(error_type="all_errors", out_features=6,
                           pos_weight=True)
    got = _class_counts(cfg, FakeFold())
    np.testing.assert_allclose(got, [10.0, 20.0, 5.0, 40.0, 60.0, 80.0])
    # scale=1.0 disables; pos_weight off -> no weights at all
    got = _class_counts(cfg.replace(es_weight_scale=1.0), FakeFold())
    np.testing.assert_allclose(got, FakeFold.specific_error_distribution)
    assert _class_counts(cfg.replace(pos_weight=False), FakeFold()) is None
    # binary path untouched by the ES scale
    got = _class_counts(cfg.replace(error_type="global"), FakeFold())
    np.testing.assert_allclose(got, [3.0, 7.0])
