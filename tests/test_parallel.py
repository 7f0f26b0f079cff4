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


def test_tp_placement_is_path_driven(rng):
    """FE tensor-parallel placement matches by tree PATH, not by literal
    shapes: it survives a non-default video_dims, covers the Adam moments,
    leaves same-shaped non-FE params replicated, and degrades non-divisible
    widths to replication with a warning."""
    import warnings as _warnings

    from jax.sharding import PartitionSpec as P

    from med_tpu.parallel import shard_params

    mesh = make_mesh((4, 2))
    cfg = ExperimentConfig(model_name="SimpleCNN", use_pallas=False,
                           video_dims=48)  # non-default FE output width
    exp = Experiment(cfg)
    batch = synth_batch(rng, cfg)
    state = exp.init_state(jax.random.key(0), batch)
    state = shard_state(state, mesh)

    assert state.params["fe"]["dense0"]["kernel"].sharding.spec == P(None, "model")
    assert state.params["fe"]["dense0"]["bias"].sharding.spec == P("model")
    assert state.params["fe"]["dense1"]["kernel"].sharding.spec == P("model", None)
    assert state.params["fe"]["out"]["kernel"].sharding.spec == P()

    # Adam moments mirror the param dict -> same TP placement by path
    n_tp_moments = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.opt_state):
        keys = [getattr(k, "key", None) for k in path]
        if "fe" in keys and "dense0" in keys and keys[-1] == "kernel":
            assert leaf.sharding.spec == P(None, "model")
            n_tp_moments += 1
    assert n_tp_moments >= 2  # mu and nu at least

    # a non-FE tree with the FE's literal shapes stays replicated
    decoy = {"model": {"w": jnp.zeros((2048, 512)), "b": jnp.zeros((512,))}}
    out = shard_params(decoy, mesh)
    assert out["model"]["w"].sharding.spec == P()
    assert out["model"]["b"].sharding.spec == P()

    # non-divisible FE width: replicate + warn instead of silent wrong shard
    odd = {"fe": {"dense0": {"kernel": jnp.zeros((16, 31))}}}
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        out = shard_params(odd, mesh)
    assert out["fe"]["dense0"]["kernel"].sharding.spec == P()
    assert any("not divisible" in str(x.message) for x in w)

    # shard_batch warns on a non-divisible leading axis
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        sb = shard_batch({"x": jnp.zeros((10, 4))}, mesh)  # 10 % 4 != 0
    assert sb["x"].sharding.spec == P()
    assert any("not divisible" in str(x.message) for x in w)


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


def test_fold_parallel_whole_run_matches_sequential_fused_runs(tmp_path, rng):
    """FoldParallelWindowRun (all folds x all epochs x eval x best-ckpt
    selection in ONE sharded program) reproduces each fold's own sequential
    fused whole-run exactly — including folds of DIFFERENT sizes, whose
    surplus canonical steps must be no-ops."""
    from med_tpu.data.datasets import build_window_fold
    from med_tpu.parallel.folds import FoldParallelWindowRun
    from med_tpu.train.loop import train_window_fold
    from tests.test_end_to_end import make_synth_fold

    cfg = ExperimentConfig(model_name="SimpleCNN", batch_size=32, n_epochs=2,
                           lr=1e-3, use_pallas=False)
    folds = []
    for i, frames in enumerate((160, 220)):  # different fold sizes
        root = tmp_path / f"f{i}"
        root.mkdir()
        d = make_synth_fold(root, rng, frames_per_trial=frames)
        folds.append(build_window_fold(d, cfg))
    assert len(folds[0][0]) != len(folds[1][0])

    exp = Experiment(cfg)
    seq = [train_window_fold(cfg, tf, ef) for tf, ef in folds]

    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    fpr = FoldParallelWindowRun(Experiment(cfg), cfg, folds, mesh=mesh)
    fp = FoldParallel(fpr.exp, mesh=mesh)
    sample_batches = [
        {"images": tf.images[:cfg.batch_size],
         "kinematics": tf.kinematics[:cfg.batch_size],
         "labels": tf.labels_for(cfg.error_type)[:cfg.batch_size],
         "mask": np.ones(cfg.batch_size, np.float32)}
        for tf, _ in folds
    ]
    states = fp.init_states([jax.random.key(cfg.seed)] * 2, sample_batches)
    states, bckpts, outs = fpr.run(states, 0, cfg.n_epochs)
    tcms, tlosses, preds, probs, ecms, elosses, scores = outs

    for k, (tf, ef) in enumerate(folds):
        n_ev = len(ef)
        best_e = int(seq[k]["best"]["epoch"])
        got_preds = np.asarray(preds)[k, best_e].reshape(-1)[:n_ev]
        # vmapped matmuls reduce in a different order; fp32 noise compounds
        # over Adam steps and can flip rare boundary windows — require near-
        # total agreement rather than bit equality (same rationale as
        # test_fold_parallel_matches_sequential's tolerance)
        agree = np.mean(got_preds == np.asarray(seq[k]["best"]["preds"]))
        assert agree > 0.99, agree
        # per-epoch history parity: mean train loss over the fold's REAL steps
        s_real = -(-len(tf) // cfg.batch_size)
        for e, row in enumerate(seq[k]["history"]):
            got_tl = float(np.mean(np.asarray(tlosses)[k, e, :s_real]))
            tol = 1e-5 if e == 0 else 2e-3
            assert got_tl == pytest.approx(row["train_loss"], abs=tol)
        # device scores match the sequential run's selection metric stream
        for e, row in enumerate(seq[k]["history"]):
            assert float(np.asarray(scores)[k, e]) == pytest.approx(
                row.get("test_f1_weighted", row["test_f1"]), abs=5e-3)
        # winning checkpoint matches (vmapped matmuls reduce in a different
        # order than unbatched ones; fp32 noise compounds over Adam steps —
        # same tolerance as test_fold_parallel_matches_sequential)
        best_par = unstack_tree(bckpts, k)
        for a, b in zip(jax.tree.leaves(best_par),
                        jax.tree.leaves(seq[k]["checkpoint"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=1e-2)


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
