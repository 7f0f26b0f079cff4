"""SP training mode (parallel/sp_train.py): the generalized masked losses
equal the engine's objectives (padded trials, true_len < T, every label
regime), and the full SP fold loop is invariant to the shard count and
cross-checks against the single-chip engine's eval pass."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from med_tpu.config import ExperimentConfig
from med_tpu.models.cog import COG
from med_tpu.parallel import make_mesh
from med_tpu.parallel.seqpar import shard_sequence
from med_tpu.parallel.sp_cog import sp_cog_loss_masked
from med_tpu.parallel.sp_train import (
    SPFrameTrainer,
    _track_targets,
    train_sp_frame_fold,
)
from med_tpu.train import losses

NUM_R = 1
LEN_Q = 6
CFG = dict(num_layers_basic=3, num_layers_r=2, num_r=NUM_R, f_maps=8,
           f_dim=12, out_classes=2, d_model=16, d_q=2, len_q=LEN_Q,
           use_pallas=False, fused=False)
T = 256
TRUE_LEN = 201
SMOOTH = 0.15


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices())


@pytest.fixture(scope="module")
def cog():
    rng = np.random.default_rng(7)
    model = COG(**CFG)
    x = jnp.asarray(rng.normal(size=(1, T, CFG["f_dim"])), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    labels = np.zeros(T, np.int64)
    labels[:TRUE_LEN] = rng.integers(0, 2, TRUE_LEN)
    mask = np.zeros(T, np.float32)
    mask[:TRUE_LEN] = 1.0
    return model, variables, x, labels, mask


def _sp_loss_and_grads(mesh, variables, x, batch_tracks, **kw):
    def local(params, consts, xs, tlf, tmf, tla, tma):
        def f(p):
            return sp_cog_loss_masked(
                p, consts, xs, tlf, tmf, tla, tma, num_r=NUM_R, len_q=LEN_Q,
                smooth_lambda=SMOOTH, axis_name="data", **kw)[0]

        return jax.value_and_grad(f)(params)

    tlf, tmf, tla, tma = batch_tracks
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                  P("data")),
        out_specs=(P(), P()),
    ))(variables["params"], variables["constants"], x[0],
       shard_sequence(jnp.asarray(tlf), mesh),
       shard_sequence(jnp.asarray(tmf), mesh),
       shard_sequence(jnp.asarray(tla), mesh),
       shard_sequence(jnp.asarray(tma), mesh))


def _assert_grads_close(ref_g, got_g, rtol=5e-5, atol=1e-6):
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_g),
        jax.tree_util.tree_leaves_with_path(got_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(pa))


def test_sp_cog_loss_masked_matches_engine_global(mesh, cog):
    """true_len < T (padded trial): sp_cog_loss_masked == the engine's
    per-track cog_track_loss objective, values and gradients."""
    model, variables, x, labels, mask = cog
    constants = variables["constants"]
    true_len = jnp.asarray(TRUE_LEN, jnp.int32)
    jl = jnp.asarray(labels)

    def ref_loss(params):
        out_list, _ = model.apply(
            {"params": params, "constants": constants}, x, train=False)
        ce_total, sm_total = 0.0, 0.0
        for track in out_list:
            ce, sm = losses.cog_track_loss(track, jl, true_len, SMOOTH)
            ce_total += ce
            sm_total += sm
        n = len(out_list)
        return ce_total / n + SMOOTH * (sm_total / n)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(variables["params"])

    tlf, tmf = _track_targets(labels, mask, TRUE_LEN, T)
    tla, tma = _track_targets(labels, mask, TRUE_LEN, T // 16)
    got_l, got_g = _sp_loss_and_grads(mesh, variables, x,
                                      (tlf, tmf, tla, tma))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    _assert_grads_close(ref_g, got_g)


def test_sp_cog_loss_masked_matches_engine_sequential(mesh, cog):
    """Sequential regime (gated 5-class CE on powerset labels) under SP ==
    engine._cog_sequential_loss, values and gradients."""
    from med_tpu.train.engine import _cog_sequential_loss

    model, variables, x, _, mask = cog
    constants = variables["constants"]
    rng = np.random.default_rng(13)
    labels = np.zeros(T, np.int64)
    labels[:TRUE_LEN] = rng.integers(0, 6, TRUE_LEN)
    gate = (labels != 0).astype(np.float32) * mask
    cfg = ExperimentConfig(model_name="COG", dataset_type="frame",
                           error_type="sequential", out_features=5,
                           smooth_lambda=SMOOTH)
    batch = {"labels": jnp.asarray(labels),
             "true_len": jnp.asarray(TRUE_LEN, jnp.int32),
             "gate": jnp.asarray(gate), "mask": jnp.asarray(mask)}

    def ref_loss(params):
        out_list, _ = model.apply(
            {"params": params, "constants": constants}, x, train=False)
        loss, _ = _cog_sequential_loss(cfg, out_list, batch, len(out_list))
        return loss

    ref_l, ref_g = jax.value_and_grad(ref_loss)(variables["params"])

    tlf, tmf = _track_targets(labels, mask, TRUE_LEN, T, gate=gate,
                              shift=True)
    tla, tma = _track_targets(labels, mask, TRUE_LEN, T // 16, gate=gate,
                              shift=True)
    got_l, got_g = _sp_loss_and_grads(mesh, variables, x,
                                      (tlf, tmf, tla, tma))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    _assert_grads_close(ref_g, got_g)


# --------------------------------------------------------------- fold loop
pytest_fold = pytest.mark.slow


def _frame_fold(tmp_path, rng):
    from med_tpu.data.datasets import build_frame_fold
    from tests.test_end_to_end import make_synth_fold

    fold_dir = make_synth_fold(tmp_path, rng, n_trials=5,
                               frames_per_trial=160)
    cfg = _sp_cfg()
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")
    return cfg, train_trials, test_trials


def _sp_cfg(**kw):
    base = dict(model_name="COG", dataset_type="frame",
                data_type="kinematics", out_features=2, batch_size=1,
                use_pallas=False, num_layers_Basic=3, num_layers_R=2,
                num_R=1, mstcn_stages=3, mstcn_f_maps=8, d_model=16, d_q=2,
                sequence_length=6, n_epochs=2, lr=1e-3)
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.mark.slow
def test_sp_fold_shard_invariance(tmp_path, rng):
    """The full SP fold (2 epochs, dropout on, eval, best selection) is
    invariant to the shard count: 4-way T-sharding reproduces the 1-shard
    run (same global dropout draws; only psum reduction order differs)."""
    cfg, train_trials, test_trials = _frame_fold(tmp_path, rng)
    devs = jax.devices()
    mesh4 = make_mesh(shape=(4,), devices=devs[:4])
    mesh1 = make_mesh(shape=(1,), devices=devs[:1])
    # share the widest mesh's bucket: the dropout draw depends on padded T
    bucket = SPFrameTrainer(cfg, mesh4).bucket_for(
        list(train_trials) + list(test_trials))

    res4 = train_sp_frame_fold(cfg, train_trials, test_trials, mesh4,
                               bucket=bucket)
    res1 = train_sp_frame_fold(cfg, train_trials, test_trials, mesh1,
                               bucket=bucket)

    assert len(res4["history"]) == len(res1["history"]) == cfg.n_epochs
    for a, b in zip(res4["history"], res1["history"]):
        assert a["train_loss"] == pytest.approx(b["train_loss"], abs=2e-4)
        assert a["test_loss"] == pytest.approx(b["test_loss"], abs=2e-4)
        assert a["test_f1"] == pytest.approx(b["test_f1"], abs=5e-3)
    assert res4["best"]["epoch"] == res1["best"]["epoch"]
    pa = np.asarray(res4["best"]["preds"])
    pb = np.asarray(res1["best"]["preds"])
    assert pa.shape == pb.shape
    assert np.mean(pa == pb) > 0.999
    for x, y in zip(jax.tree.leaves(res4["checkpoint"]),
                    jax.tree.leaves(res1["checkpoint"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_sp_fold_tecno_eval_matches_engine_and_resumes(tmp_path, rng):
    """TeCNo SP fold: (a) training learns; (b) the SP eval pass on the
    trained params equals the single-chip engine's eval step (different
    padding buckets — the masked losses/CMs are padding-invariant);
    (c) a resume run restarts at the snapshot epoch."""
    from med_tpu.data.datasets import build_frame_fold, frame_batch
    from med_tpu.tracking import RunTracker
    from med_tpu.train.engine import Experiment
    from tests.test_end_to_end import make_synth_fold

    cfg = _sp_cfg(model_name="TeCNo", mstcn_layers=3, mstcn_stages=2,
                  n_epochs=2)
    fold_dir = make_synth_fold(tmp_path, rng, n_trials=4,
                               frames_per_trial=160)
    train_trials = build_frame_fold(fold_dir, cfg, "train.csv")
    test_trials = build_frame_fold(fold_dir, cfg, "test.csv")
    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])

    tracker = RunTracker(root=str(tmp_path / "runs"), experiment="sp")
    res = train_sp_frame_fold(cfg, train_trials, test_trials, mesh,
                              tracker=tracker, tag="LOSO_sp")
    assert len(res["history"]) == 2
    assert np.isfinite(res["best"]["test_loss"])

    # cross-check: engine eval on the SP-trained params
    exp = Experiment(cfg)
    b0 = frame_batch(train_trials[0], cfg)
    state = exp.init_state(jax.random.key(cfg.seed),
                           {k: v for k, v in b0.items()
                            if not k.startswith("_")})
    state = state.replace(
        params=jax.tree.map(jnp.asarray, res["checkpoint"]["params"]))
    trainer = SPFrameTrainer(cfg, mesh)
    bucket = trainer.bucket_for(list(train_trials) + list(test_trials))
    sp_state = trainer.init_state(jax.random.key(cfg.seed),
                                  train_trials[0], bucket)
    sp_state = sp_state.replace(
        params=jax.tree.map(jnp.asarray, res["checkpoint"]["params"]))
    for trial in test_trials:
        eb = frame_batch(trial, cfg)
        m_engine = exp.eval_step(state, {k: v for k, v in eb.items()
                                         if not k.startswith("_")})
        sb = trainer.shard(trainer.make_batch(trial, bucket))
        m_sp = trainer.eval_step(sp_state, sb)
        np.testing.assert_allclose(float(m_sp["loss"]),
                                   float(m_engine["loss"]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_sp["cm"]),
                                      np.asarray(m_engine["cm"]))

    # resume: the snapshot records the last completed epoch
    cfg3 = cfg.replace(n_epochs=3)
    res3 = train_sp_frame_fold(cfg3, train_trials, test_trials, mesh,
                               tracker=tracker, tag="LOSO_sp", resume=True)
    assert [r["epoch"] for r in res3["history"]] == [2]
