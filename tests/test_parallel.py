"""Parallelism tests on the 8-device CPU mesh: DP+TP sharded train step,
fold-parallel vmap parity vs sequential training, prefetch, viz, results
analysis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.parallel import make_mesh, shard_batch, shard_state
from med_tpu.parallel.folds import FoldParallel, stack_trees, unstack_tree
from med_tpu.train.engine import Experiment

pytestmark = pytest.mark.slow  # compile-heavy; skip via -m 'not slow'


def synth_batch(rng, cfg, B=16, shift=0.0):
    W = cfg.window_size
    labels = rng.integers(0, 2, B)
    kin = rng.normal(size=(B, W, 26)).astype(np.float32) + shift
    return {
        "images": jnp.asarray(rng.normal(size=(B, W, 2048)), jnp.float32),
        "kinematics": jnp.asarray(kin + labels[:, None, None]),
        "labels": jnp.asarray(labels),
        "mask": jnp.ones(B, jnp.float32),
    }


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_dp_tp_sharded_step_matches_single_device(rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", use_pallas=False)
    exp = Experiment(cfg)
    batch = synth_batch(rng, cfg)
    state = exp.init_state(jax.random.key(0), batch)
    # single-device step
    s1, m1 = exp.train_step(state, batch)

    # sharded step from the same initial state
    mesh = make_mesh((4, 2))
    exp2 = Experiment(cfg)
    state2 = exp2.init_state(jax.random.key(0), batch)
    state2 = shard_state(state2, mesh)
    batch2 = shard_batch(batch, mesh)
    s2, m2 = exp2.train_step(state2, batch2)
    assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1["cm"]), np.asarray(m2["cm"]))
    # params agree after the update
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_fold_parallel_matches_sequential(rng):
    cfg = ExperimentConfig(model_name="SimpleCNN", use_pallas=False)
    exp = Experiment(cfg)
    batches = [synth_batch(rng, cfg, shift=float(k)) for k in range(2)]
    rngs = [jax.random.key(k) for k in range(2)]

    # sequential
    seq_states = []
    for r, b in zip(rngs, batches):
        s = exp.init_state(r, b)
        for _ in range(3):
            s, m = exp.train_step(s, b)
        seq_states.append((s, float(m["loss"])))

    # fold-parallel (vmap over the fold axis)
    fp = FoldParallel(exp, mesh=None)
    states = fp.init_states(rngs, batches)
    stacked_batches = fp.shard_batches(batches)
    for _ in range(3):
        states, metrics = fp.train_step(states, stacked_batches)
    for k in range(2):
        want_loss = seq_states[k][1]
        got_loss = float(metrics["loss"][k])
        assert abs(got_loss - want_loss) < 1e-4, (k, got_loss, want_loss)
        p_seq = jax.tree.leaves(seq_states[k][0].params)[0]
        p_par = jax.tree.leaves(unstack_tree(states, k).params)[0]
        # vmapped conv/matmul kernels reduce in a different order than the
        # unbatched ones; the fp32 noise compounds over the Adam steps
        np.testing.assert_allclose(np.asarray(p_par), np.asarray(p_seq),
                                   atol=2e-4)

    # same thing with the fold axis sharded across devices
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    fp_mesh = FoldParallel(exp, mesh=mesh)
    states_m = fp_mesh.init_states(rngs, batches)
    batches_m = fp_mesh.shard_batches(batches)
    for _ in range(3):
        states_m, metrics_m = fp_mesh.train_step(states_m, batches_m)
    for k in range(2):
        assert abs(float(metrics_m["loss"][k]) - seq_states[k][1]) < 1e-4


def test_prefetch_roundtrip(rng):
    from med_tpu.utils.prefetch import prefetch_to_device

    batches = [{"x": np.full((4,), i), "_idx": i} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))
        assert b["_idx"] == i


def test_viz_writes_pngs(tmp_path):
    from med_tpu.viz import plot_cm, plot_results_LOSO

    p = plot_results_LOSO([0.5, 0.6], [0.4, 0.5], [1.0, 0.8], [1.1, 0.9],
                          "LOSO", "1Out", str(tmp_path))
    import os

    assert os.path.exists(p)
    paths = plot_cm(np.eye(2, dtype=int) * 5, np.eye(2, dtype=int) * 3,
                    str(tmp_path), binary="global")
    assert all(os.path.exists(q) for q in paths)
    paths = plot_cm(np.eye(6, dtype=int), np.eye(6, dtype=int), str(tmp_path))
    assert all(os.path.exists(q) for q in paths)


def test_results_analysis(rng):
    from med_tpu.eval.results import (
        majority_baseline,
        paired_t_test,
        per_error_type_f1,
    )

    dumps = {}
    for fold in ("1Out", "2Out"):
        n = 100
        raw = rng.integers(0, 2, size=(n, 5))
        preds = raw[:, 4].copy()
        preds[:10] = 1 - preds[:10]  # imperfect predictor
        dumps[fold] = {
            "raw_labels": raw.tolist(),
            "preds": preds.tolist(),
            "labels": raw[:, 4].tolist(),
        }
    per = per_error_type_f1(dumps)
    assert set(per) == {"Out_Of_View", "Needle_Drop", "Multiple_Attempts",
                        "Needle_Position", "Error"}
    assert per["Error"][0] > 0.8  # predictor tracks the global flag

    base = majority_baseline(dumps)
    assert 0 <= base["accuracy"][0] <= 1

    t, p = paired_t_test([0.7, 0.8, 0.75], [0.6, 0.65, 0.7])
    assert p < 0.2


def test_run_alignment_and_overlap(rng):
    from med_tpu.eval.results import (
        check_run_alignment,
        prediction_overlap,
        probability_histograms,
    )
    import pytest as _pytest

    y = rng.integers(0, 2, 50)
    d_a = {"1Out": {"labels": y.tolist(), "preds": y.tolist(),
                    "probs": rng.random(50).tolist(),
                    "subjects": ["s"] * 50, "gestures": [1] * 50}}
    d_b = {"1Out": {"labels": y.tolist(),
                    "preds": (1 - y).tolist(),
                    "probs": rng.random(50).tolist(),
                    "subjects": ["s"] * 50, "gestures": [1] * 50}}
    check_run_alignment(d_a, d_b)
    ov = prediction_overlap(d_a, d_b)
    assert ov["both_correct"] == 0.0 and ov["exactly_one_correct"] == 1.0

    bad = {"1Out": dict(d_b["1Out"], labels=(1 - y).tolist())}
    with _pytest.raises(ValueError):
        check_run_alignment(d_a, bad)

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "hist.png")
    assert os.path.exists(probability_histograms(d_a, path))


def test_trial_parallel_sharded_over_mesh(rng):
    """Trial-parallel frame step with the trial axis sharded over the mesh
    'data' axis (DP across trials on multiple chips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        trial_batch=4, use_pallas=False,
    )
    exp = Experiment(cfg)
    G, Tp = 4, 128
    single = {
        "images": jnp.zeros((1, Tp, 2048), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, Tp, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, Tp)),
        "mask": jnp.ones(Tp, jnp.float32),
        "true_len": jnp.asarray(Tp, jnp.int32),
    }
    state = exp.init_state(jax.random.key(0), single)
    stacked = {k: jnp.stack([v] * G) for k, v in single.items()}
    stacked["trial_weight"] = jnp.ones(G, jnp.float32)

    mesh = make_mesh((4, 2))
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
        for k, v in stacked.items()
    }
    state = shard_state(state, mesh)
    state, m = exp.train_step(state, sharded)
    assert np.isfinite(float(m["loss"]))
    assert int(np.asarray(m["cm"]).sum()) == G * Tp
