"""Construction + forward-shape tests for all seven model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from med_tpu.config import ExperimentConfig
from med_tpu.models import build_feature_extractor, build_model


def init_and_apply(model, *args, method=None):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, *args, train=False)
    out = model.apply(variables, *args, train=False)
    # also exercise the training path (dropout + batch-stats mutation)
    out_train = model.apply(
        variables,
        *args,
        train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    return variables, out, out_train


@pytest.mark.parametrize("window,freq", [(10, 5), (30, 15)])
def test_window_cnn(window, freq):
    cfg = ExperimentConfig(model_name="SimpleCNN", frequency=freq)
    model = build_model(cfg)
    x = jnp.zeros((4, window, cfg.in_features()))
    _, out, (out_t, mut) = init_and_apply(model, x)
    assert out.shape == (4, 1)
    assert out_t.shape == (4, 1)
    assert "batch_stats" in mut


def test_window_lstm():
    cfg = ExperimentConfig(model_name="SimpleLSTM", out_features=6)
    model = build_model(cfg)
    x = jnp.zeros((3, 10, cfg.in_features()))
    _, out, _ = init_and_apply(model, x)
    assert out.shape == (3, 6)


@pytest.mark.parametrize("name", ["Siamese_CNN", "Siamese_LSTM"])
def test_siamese(name):
    cfg = ExperimentConfig(model_name=name)
    model = build_model(cfg)
    x1 = jnp.ones((4, 10, cfg.in_features()))
    x2 = jnp.zeros((4, 10, cfg.in_features()))
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x1, x2, train=False)
    out = model.apply(variables, x1, x2, train=False)
    assert out.shape == (4, 1)
    # twins share weights: same input pair -> |f1-f2| = 0 regardless of input
    out_same = model.apply(variables, x1, x1, train=False)
    out_same2 = model.apply(variables, x2, x2, train=False)
    np.testing.assert_allclose(out_same, out_same2, atol=1e-5)


def test_tecno():
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="video",
        video_dims=2048, out_features=2, batch_size=1,
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 100, 2048))
    _, out, _ = init_and_apply(model, x)
    assert out.shape == (cfg.mstcn_stages, 1, 100, 2)


def test_tecno_causality():
    """Causal conv: future frames cannot change past logits."""
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="video",
        video_dims=2048, out_features=2, batch_size=1,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 2048)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    out1 = model.apply(variables, jnp.asarray(x), train=False)
    x2 = x.copy()
    x2[0, 50:] += 100.0
    out2 = model.apply(variables, jnp.asarray(x2), train=False)
    np.testing.assert_allclose(out1[:, :, :50], out2[:, :, :50], atol=1e-4)
    assert np.abs(np.asarray(out1[:, :, 55:]) - np.asarray(out2[:, :, 55:])).max() > 1e-3


def test_transsvnet():
    cfg = ExperimentConfig(
        model_name="TransSVNet", dataset_type="frame", data_type="video",
        video_dims=2048, out_features=2, batch_size=1,
    )
    model = build_model(cfg)
    logits = jnp.zeros((1, 77, 2))
    feats = jnp.zeros((1, 77, 2048))
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, logits, feats, train=False)
    out = model.apply(variables, logits, feats, train=False)
    assert out.shape == (1, 77, 2)


@pytest.mark.slow
def test_cog():
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="multimodal",
        video_dims=32, out_features=2, batch_size=1, mstcn_stages=8,
        use_pallas=False,
    )
    model = build_model(cfg)
    T = 97
    x = jnp.zeros((1, T, cfg.in_features()))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    out_list, f_list = model.apply(variables, x, train=False)
    assert len(out_list) == 4 + 1 + cfg.num_R == cfg.mstcn_stages
    for o in out_list[:4]:
        assert o.shape == (1, T, 2)
    for o in out_list[4:]:
        assert o.shape == (1, T // 16, 2)
    # frozen prompts live outside 'params'
    assert "constants" in variables
    assert variables["constants"]["gest_embed"].shape == (15, 512)
    # training path with dropout
    out_t, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert len(out_t[0]) == cfg.mstcn_stages


def test_feature_extractor():
    cfg = ExperimentConfig()
    fe = build_feature_extractor(cfg)
    x = jnp.zeros((4, 10, 2048))
    variables = fe.init({"params": jax.random.key(0)}, x)
    out = fe.apply(variables, x)
    assert out.shape == (4, 10, 32)
    assert build_feature_extractor(cfg.replace(data_type="kinematics")) is None
    assert build_feature_extractor(cfg.replace(video_dims=2048)) is None


def test_cog_causality():
    """COG slow-path logits are causal (dilated causal convs + backward-only
    attention windows)."""
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=False,
        num_layers_Basic=4, num_layers_R=3, num_R=1, mstcn_stages=3,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 80, 26)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    out1, _ = model.apply(variables, jnp.asarray(x), train=False)
    x2 = x.copy()
    x2[0, 70:] += 50.0
    out2, _ = model.apply(variables, jnp.asarray(x2), train=False)
    np.testing.assert_allclose(out1[0][0, :60], out2[0][0, :60], atol=1e-4)


@pytest.mark.slow
def test_cog_variants(rng):
    """SRM and skill-prompt COG variants (reference models_COG.py:262-480)."""
    base = dict(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=False,
        num_layers_Basic=2, num_layers_R=2, num_R=1, mstcn_stages=3,
        d_model=16, d_q=2, sequence_length=6,
    )
    x = jnp.zeros((1, 48, 26))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

    # SRM: second chain over 15 skill statements, features concatenated
    cfg = ExperimentConfig(**base, SRM=True)
    m = build_model(cfg)
    v = m.init(rngs, x, train=False)
    assert v["constants"]["skill_embed"].shape == (15, 512)
    out_list, _ = m.apply(v, x, train=False)
    assert out_list[0].shape == (1, 48, 2)

    # skill-conditioned prompts: 3 skills x 15 gestures = 45 rows
    cfg = ExperimentConfig(**base, use_skill_prompt=True)
    m = build_model(cfg)
    v = m.init(rngs, x, train=False)
    assert v["constants"]["gest_embed"].shape == (45, 512)

    # observed-gesture subset: 8 rows
    cfg = ExperimentConfig(**base, use_all_gestures=False)
    m = build_model(cfg)
    v = m.init(rngs, x, train=False)
    assert v["constants"]["gest_embed"].shape == (8, 512)


@pytest.mark.slow
def test_bf16_compute_dtype(rng):
    """compute_dtype='bfloat16' runs the TCN paths in bf16 with fp32 params
    and fp32 logits, staying close to the fp32 forward."""
    base = dict(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=False,
        num_layers_Basic=3, num_layers_R=2, num_R=1, mstcn_stages=3,
        d_model=16, d_q=2, sequence_length=6,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 26)),
                    jnp.float32)
    m32 = build_model(ExperimentConfig(**base))
    v = m32.init({"params": jax.random.key(0)}, x, train=False)
    out32, _ = m32.apply(v, x, train=False)

    m16 = build_model(ExperimentConfig(**base, compute_dtype="bfloat16"))
    out16, _ = m16.apply(v, x, train=False)  # same fp32 params
    assert out16[0].dtype == jnp.float32  # logits back in fp32
    # bf16 has ~3 decimal digits; logits stay close
    err = float(jnp.abs(out16[0] - out32[0]).max())
    scale = float(jnp.abs(out32[0]).max()) + 1e-6
    assert err / scale < 0.1, (err, scale)

    # TeCNo too
    cfgT = ExperimentConfig(model_name="TeCNo", dataset_type="frame",
                            data_type="kinematics", out_features=2,
                            batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
                            compute_dtype="bfloat16")
    mT = build_model(cfgT)
    vT = mT.init({"params": jax.random.key(1)}, x, train=False)
    outT = mT.apply(vT, x, train=False)
    assert outT.dtype == jnp.float32
