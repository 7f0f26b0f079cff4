"""Live ensemble serving: fused jit program matches the offline fusion rules
and runs sharded over the mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from med_tpu.config import ExperimentConfig
from med_tpu.eval.serving import EnsembleServer, WindowModelBundle
from med_tpu.parallel import make_mesh
from med_tpu.train.engine import Experiment


def make_bundle(rng, seed, data_type="multimodal"):
    cfg = ExperimentConfig(model_name="SimpleCNN", data_type=data_type,
                           use_pallas=False)
    exp = Experiment(cfg)
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 10, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(8, 10, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, 8)),
        "mask": jnp.ones(8, jnp.float32),
    }
    state = exp.init_state(jax.random.key(seed), batch)
    ckpt = jax.device_get({"params": state.params,
                           "batch_stats": state.batch_stats})
    return WindowModelBundle(cfg, ckpt)


def test_soft_vote_server_matches_members(rng):
    a = make_bundle(rng, 0)
    b = make_bundle(rng, 1, data_type="kinematics")
    server = EnsembleServer([a, b], mode="soft_vote")
    B = 16
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, p = server.predict(images, kin)
    pa = jax.nn.sigmoid(a.logits(jnp.asarray(images), jnp.asarray(kin)).reshape(-1))
    pb = jax.nn.sigmoid(b.logits(jnp.asarray(images), jnp.asarray(kin)).reshape(-1))
    want_p = (np.asarray(pa) + np.asarray(pb)) / 2
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(preds), (want_p >= 0.5).astype(int))


def test_cascade_server(rng):
    binary = make_bundle(rng, 0)
    cfg_mc = ExperimentConfig(model_name="SimpleCNN", error_type="all_errors",
                              out_features=6, use_pallas=False)
    exp = Experiment(cfg_mc)
    batch = {
        "images": jnp.zeros((8, 10, 2048)),
        "kinematics": jnp.zeros((8, 10, 26)),
        "labels": jnp.zeros(8, jnp.int32),
        "mask": jnp.ones(8, jnp.float32),
    }
    state = exp.init_state(jax.random.key(3), batch)
    multi = WindowModelBundle(cfg_mc, jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}))

    server = EnsembleServer([binary, multi], mode="cascade")
    B = 16
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, bprob = server.predict(images, kin)
    preds = np.asarray(preds)
    bp = np.asarray(bprob)
    assert (preds[bp <= 0.5] == 0).all()


def test_server_on_mesh(rng):
    a = make_bundle(rng, 0)
    server_plain = EnsembleServer([a], mode="soft_vote")
    mesh = make_mesh()
    server = EnsembleServer([a], mode="soft_vote", mesh=mesh)
    B = 32  # divisible by mesh data axis
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, p = server.predict(images, kin)
    preds0, p0 = server_plain.predict(images, kin)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0), atol=1e-6)
    assert preds.shape == (B,)


def test_frame_model_server(rng):
    from med_tpu.eval.serving import FrameModelServer

    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        use_pallas=False,
    )
    exp = Experiment(cfg)
    T = 120
    batch = {
        "images": jnp.zeros((1, 256, 2048)),
        "kinematics": jnp.zeros((1, 256, 26)),
        "labels": jnp.zeros(256, jnp.int32),
        "mask": jnp.ones(256, jnp.float32),
        "true_len": jnp.asarray(256, jnp.int32),
    }
    state = exp.init_state(jax.random.key(0), batch)
    ckpt = jax.device_get({"params": state.params,
                           "batch_stats": state.batch_stats})
    stats = {"kinematics": {"mean": np.zeros(26, np.float32),
                            "std": np.ones(26, np.float32)}}
    server = FrameModelServer(cfg, ckpt, stats=stats)
    preds, probs = server.predict_trial(
        rng.normal(size=(T, 2048)).astype(np.float32),
        rng.normal(size=(T, 26)).astype(np.float32),
    )
    assert preds.shape == (T,)
    assert probs.shape == (T,)
    assert set(np.unique(preds)) <= {0, 1}
