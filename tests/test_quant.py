"""int8 serving-trunk quantization (med_tpu/ops/quant.py).

Two pins: the requant arithmetic is EXACT against a literal numpy oracle
(fold -> per-channel weight quant -> int32 conv -> dequant epilogue ->
requant), and the end-to-end int8 trunk's feature drift vs the fp32 trunk is
bounded. The quantized path is a serving-only extra (the reference has no
quantized path); accuracy is a documented tolerance, not parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from med_tpu.models.resnet import ResNet50
from med_tpu.ops.quant import (
    fold_conv_bn,
    quantize_resnet50_trunk,
    quantize_tensor,
    quantize_weights_per_channel,
    resnet50_int8_apply,
)


def test_fold_and_requant_match_literal_oracle():
    """One folded 1x1 conv + requant, computed two ways: the module's jnp
    path vs literal numpy integer arithmetic."""
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(1, 1, 4, 6)).astype(np.float32)
    conv_p = {"kernel": kernel}
    bn_p = {"scale": rng.uniform(0.5, 2.0, 6).astype(np.float32),
            "bias": rng.normal(size=6).astype(np.float32)}
    bn_s = {"mean": rng.normal(size=6).astype(np.float32),
            "var": rng.uniform(0.5, 2.0, 6).astype(np.float32)}

    k, b = fold_conv_bn(conv_p, bn_p, bn_s)
    # fold identity: a*(conv) + b == BN(conv) in inference mode
    a = bn_p["scale"] / np.sqrt(bn_s["var"] + 1e-5)
    np.testing.assert_allclose(k, kernel * a, rtol=1e-6)
    np.testing.assert_allclose(b, bn_p["bias"] - bn_s["mean"] * a, rtol=1e-6)

    wq, ws = quantize_weights_per_channel(k)
    assert wq.dtype == np.int8
    # per-channel scale saturates exactly at +-127
    np.testing.assert_allclose(
        np.max(np.abs(wq), axis=(0, 1, 2)), 127, atol=0)

    x = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    sx = np.float32(np.max(np.abs(x)) / 127.0)
    xq = np.asarray(quantize_tensor(jnp.asarray(x), sx))
    # literal oracle: int32 accumulation of the 1x1 conv, then the epilogue
    acc = np.einsum("nhwi,io->nhwo", xq.astype(np.int32),
                    wq[0, 0].astype(np.int32))
    want = acc.astype(np.float32) * (sx * ws) + b

    from med_tpu.ops.quant import _conv_i8, _dequant_epilogue

    got = _dequant_epilogue(
        _conv_i8(jnp.asarray(xq), jnp.asarray(wq), 1, 0), sx,
        {"wscale": jnp.asarray(ws), "bias": jnp.asarray(b)})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quantize_tensor_clips_and_rounds():
    s = np.float32(0.5)
    x = jnp.asarray([0.24, 0.26, -0.25, 100.0, -100.0, 0.75], jnp.float32)
    q = np.asarray(quantize_tensor(x, s))
    # round-half-to-even at the .5 boundaries; clip at +-127
    np.testing.assert_array_equal(q, [0, 1, 0, 127, -127, 2])
    assert q.dtype == np.int8


@pytest.fixture(scope="module")
def tiny_trunk():
    model = ResNet50(stage_sizes=(1, 1, 1, 1), width=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables, x


def test_int8_trunk_feature_drift_bounded(tiny_trunk):
    model, variables, x = tiny_trunk
    ref = np.asarray(model.apply(variables, x, train=False))
    qt = quantize_resnet50_trunk(variables, x, stage_sizes=(1, 1, 1, 1))
    got = np.asarray(jax.jit(
        lambda q, v: resnet50_int8_apply(q, v, stage_sizes=(1, 1, 1, 1))
    )(qt, x))
    assert got.shape == ref.shape and got.dtype == np.float32
    # per-row cosine similarity and relative l2 drift
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert np.all(cos > 0.99), cos
    assert rel < 0.08, rel


def test_int8_trunk_unseen_batch_within_calibrated_range(tiny_trunk):
    """Static scales calibrated on one batch hold up on a different batch
    drawn from the same distribution (the serving regime)."""
    model, variables, x = tiny_trunk
    qt = quantize_resnet50_trunk(variables, x, stage_sizes=(1, 1, 1, 1))
    rng = np.random.default_rng(7)
    x2 = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.apply(variables, x2, train=False))
    got = np.asarray(resnet50_int8_apply(qt, x2, stage_sizes=(1, 1, 1, 1)))
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.98), cos


def test_int8_trunk_deeper_geometry_drift():
    """Depth-scaled drift bound on a deeper trunk (round-4 ADVICE item 2):
    (2,2,2,2) stages exercise the non-downsample residual joins — the int8
    tensor rides straight through the join at the block's input scale —
    where requant noise accumulates across 8 blocks instead of 4. The real
    (3,4,6,3) trunk's measured drift is in CLAUDE.md (cosine 0.99986 vs
    fp32 on the serving distribution, TPU v5e)."""
    model = ResNet50(stage_sizes=(2, 2, 2, 2), width=8)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(2)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    qt = quantize_resnet50_trunk(variables, x, stage_sizes=(2, 2, 2, 2))
    got = np.asarray(resnet50_int8_apply(qt, x, stage_sizes=(2, 2, 2, 2)))
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # 2x the block count of the tiny fixture: allow ~sqrt(2)x its rel bound
    assert np.all(cos > 0.985), cos
    assert rel < 0.12, rel


def test_int8_dense_matches_literal_oracle():
    """One int8 dense layer (the FE building block): the module's jnp path
    vs literal numpy integer arithmetic."""
    from med_tpu.ops.quant import _dense_i8

    rng = np.random.default_rng(3)
    k = rng.normal(size=(16, 6)).astype(np.float32)
    bias = rng.normal(size=6).astype(np.float32)
    amax = np.max(np.abs(k), axis=0)
    ws = np.maximum(amax, 1e-12) / 127.0
    wq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)

    x = rng.normal(size=(4, 5, 16)).astype(np.float32)
    sx = np.float32(np.max(np.abs(x)) / 127.0)
    xq = np.asarray(quantize_tensor(jnp.asarray(x), sx))
    acc = np.einsum("bwi,io->bwo", xq.astype(np.int32), wq.astype(np.int32))
    want = acc.astype(np.float32) * (sx * ws) + bias

    got = _dense_i8(jnp.asarray(xq), sx,
                    {"wq": jnp.asarray(wq), "wscale": jnp.asarray(
                        ws.astype(np.float32)), "bias": jnp.asarray(bias)})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_int8_fe_drift_bounded():
    """End-to-end int8 FeatureExtractor (2048->512->256->32) drift vs the
    fp32 module is bounded, on the calibration batch AND an unseen batch
    from the same distribution (the serving regime)."""
    from med_tpu.models.feature_extractor import FeatureExtractor
    from med_tpu.ops.quant import fe_int8_apply, quantize_fe

    fe = FeatureExtractor()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 10, 2048)), jnp.float32)
    variables = fe.init(jax.random.key(0), x[:1])
    qfe = quantize_fe(variables["params"], x[:4])
    for batch in (x, jnp.asarray(rng.normal(size=(8, 10, 2048)),
                                 jnp.float32)):
        ref = np.asarray(fe.apply(variables, batch), np.float32)
        got = np.asarray(fe_int8_apply(qfe, batch))
        assert got.shape == ref.shape and got.dtype == np.float32
        cos = np.sum(got * ref, -1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert np.all(cos > 0.995), cos.min()
        assert rel < 0.05, rel


def test_int8_fe_feature_store_bit_identical():
    """Serving from a pre-quantized int8 feature store
    (quantize_fe_input -> fe_int8_apply on int8 input) is BIT-identical to
    handing the same fp32 features to fe_int8_apply — the store just moves
    the layer-0 quantize off the serving step (4x less input read)."""
    from med_tpu.models.feature_extractor import FeatureExtractor
    from med_tpu.ops.quant import (fe_int8_apply, quantize_fe,
                                   quantize_fe_input)

    fe = FeatureExtractor()
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(6, 10, 2048)), jnp.float32)
    variables = fe.init(jax.random.key(1), x[:1])
    qfe = quantize_fe(variables["params"], x[:3])
    xq = quantize_fe_input(qfe, x)
    assert np.asarray(xq).dtype == np.int8
    a = np.asarray(fe_int8_apply(qfe, x))
    b = np.asarray(fe_int8_apply(qfe, xq))
    np.testing.assert_array_equal(a, b)


def test_int8_fe_layer0_scale_member_independent():
    """The layer-0 activation scale depends only on the calibration batch,
    not the member's weights — so an int8 feature store quantized once is
    valid for every ensemble member calibrated on the same batch."""
    from med_tpu.models.feature_extractor import FeatureExtractor
    from med_tpu.ops.quant import quantize_fe

    fe = FeatureExtractor()
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(4, 10, 2048)), jnp.float32)
    va = fe.init(jax.random.key(2), x[:1])
    vb = fe.init(jax.random.key(3), x[:1])
    qa = quantize_fe(va["params"], x)
    qb = quantize_fe(vb["params"], x)
    assert float(qa["layers"][0]["in_scale"]) == float(
        qb["layers"][0]["in_scale"])
