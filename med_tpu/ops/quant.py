"""Post-training int8 quantization for the ResNet-50 serving trunk.

The e2e serving path (pixels -> preprocess -> ResNet-50 -> FeatureExtractor
-> window head; reference ``preprocessing_utils.py:722-823`` feature export +
BASELINE.json pipeline) is trace-documented at the bf16 single-chip floor:
the deep-stage 3x3 convs run at 97 % MXU and the 56x56 stage is HBM
bandwidth-bound (docs/ROUND4_DEMO.md section 4). int8 sidesteps both walls on
TPU v5e — the MXU's s8 x s8 -> s32 path has 2x the bf16 peak, and int8
activations carry half the bf16 inter-layer traffic.

Scheme (standard post-training quantization; the reference has no quantized
path — this is a serving-only EXTRA, opt-in, never used for training or
parity):

- BatchNorm folded into the preceding conv (inference-only identity):
  ``y = a * conv(x) + b`` with ``a = gamma / sqrt(var + eps)`` per output
  channel, ``b = beta - mean * a``.
- Weights: symmetric per-OUTPUT-channel int8 on the folded kernel
  (``wscale[o] = max|k'[..., o]| / 127``).
- Activations: symmetric per-tensor int8 with STATIC scales calibrated from
  one representative batch (max-abs over the folded-fp forward). Post-ReLU
  tensors only occupy [0, 127] — one sign bit spent for a uniform scheme.
- Accumulation in int32 on the MXU; the dequant (per-channel scale * s_act),
  bias, ReLU and requant run as the conv epilogue in fp32 and fuse.
- The residual join and final global pool run in fp32 (the int8 tensors are
  dequantized by one scalar multiply).

Accuracy is a documented tolerance, not parity: tests pin the requant
arithmetic exactly against a literal oracle and bound the end-to-end feature
drift vs the fp32 trunk (tests/test_quant.py).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BN_EPS = 1e-5  # flax nn.BatchNorm default, matches models/resnet.py


# --------------------------------------------------------------- primitives
def quantize_tensor(x, scale):
    """fp -> int8 with symmetric scale: clip(round(x / scale), -127, 127).

    ``jnp.round`` (round-half-to-even) — the same convention the calibration
    simulation and the oracle test use.
    """
    q = jnp.round(x * (1.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def quantize_weights_per_channel(kernel) -> Tuple[np.ndarray, np.ndarray]:
    """Folded fp kernel (Kh, Kw, I, O) -> (int8 kernel, per-O fp scale)."""
    k = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(k), axis=(0, 1, 2))
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def fold_conv_bn(conv_p, bn_p, bn_s, eps: float = _BN_EPS):
    """Fold inference BN into the conv: returns (folded kernel, bias)."""
    a = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
        np.asarray(bn_s["var"], np.float32) + eps)
    k = np.asarray(conv_p["kernel"], np.float32) * a  # broadcast on O axis
    b = np.asarray(bn_p["bias"], np.float32) - np.asarray(
        bn_s["mean"], np.float32) * a
    return k, b


def _conv_i8(xq, wq, stride: int, pad: int):
    """int8 x int8 -> int32 NHWC conv (the MXU s8 path on TPU)."""
    return lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _conv_f(x, k, b, stride: int, pad: int):
    """Folded-fp conv for the calibration pass.

    precision=HIGHEST: the calibration jit may land on TPU (bf16 default
    matmul inputs), and the recorded max-abs activation scales must match
    the f32 statistics the CPU tests pin — PTQ scales should not be
    platform-dependent (round-4 ADVICE item 1)."""
    y = lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    return y + b


def _max_pool(x):
    """3x3 stride-2 pad-1 max pool (order-preserving: runs on int8 as-is)."""
    init = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                       else jnp.iinfo(x.dtype).min, x.dtype)
    return lax.reduce_window(
        x, init, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _block_geometry(stage_sizes: Sequence[int]):
    """Yield (name, stride, has_down) in models/resnet.py::ResNet50 order."""
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            stride = 2 if (stage > 0 and block == 0) else 1
            yield f"layer{stage + 1}_{block}", stride, block == 0


# ------------------------------------------------------------- calibration
def _fold_trunk(variables, stage_sizes: Sequence[int]):
    """Fold every conv+BN of a ResNet50 variables tree into (kernel, bias)."""
    params, stats = variables["params"], variables["batch_stats"]
    folded: Dict[str, Any] = {
        "conv1": fold_conv_bn(params["conv1"], params["bn1"], stats["bn1"])}
    for name, _, has_down in _block_geometry(stage_sizes):
        p, s = params[name], stats[name]
        blk = {f"c{i}": fold_conv_bn(p[f"conv{i}"], p[f"bn{i}"], s[f"bn{i}"])
               for i in (1, 2, 3)}
        if has_down:
            blk["down"] = fold_conv_bn(p["down_conv"], p["down_bn"],
                                       s["down_bn"])
        folded[name] = blk
    return folded


def _calib_forward(folded, x, stage_sizes: Sequence[int]):
    """Folded-fp forward recording max|.| at every requant point.

    Mirrors the int8 graph's structure exactly: requant points are the
    trunk input, post-ReLU conv1, and each block's two inner activations
    plus its output.
    """
    rec = {"in": jnp.max(jnp.abs(x))}
    k, b = folded["conv1"]
    y = jax.nn.relu(_conv_f(x, k, b, 2, 3))
    rec["conv1"] = jnp.max(jnp.abs(y))
    y = _max_pool(y)
    for name, stride, has_down in _block_geometry(stage_sizes):
        blk = folded[name]
        t = jax.nn.relu(_conv_f(y, *blk["c1"], 1, 0))
        rec[f"{name}/a1"] = jnp.max(jnp.abs(t))
        t = jax.nn.relu(_conv_f(t, *blk["c2"], stride, 1))
        rec[f"{name}/a2"] = jnp.max(jnp.abs(t))
        t = _conv_f(t, *blk["c3"], 1, 0)
        res = _conv_f(y, *blk["down"], stride, 0) if has_down else y
        y = jax.nn.relu(t + res)
        rec[f"{name}/out"] = jnp.max(jnp.abs(y))
    return rec


def quantize_resnet50_trunk(variables, calib_x,
                            stage_sizes: Sequence[int] = (3, 4, 6, 3)):
    """Build the int8 serving trunk from a trained ResNet50 variables tree.

    ``calib_x``: one representative PREPROCESSED batch (B, H, W, 3) fp32 —
    its max-abs statistics become the static activation scales. Returns a
    pytree consumable by :func:`resnet50_int8_apply`.
    """
    folded = _fold_trunk(variables, stage_sizes)
    # Calibration runs ON HOST CPU: it is a one-off fp32 statistics pass
    # (seconds on host), while compiling the 53-conv HIGHEST-precision
    # program through the remote TPU tunnel costs tens of minutes — and CPU
    # fp32 makes the recorded scales platform-independent by construction
    # (round-4 ADVICE item 1).
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else contextlib.nullcontext():
        args = jax.device_put((folded, jnp.asarray(calib_x, jnp.float32)), cpu) \
            if cpu is not None else (folded, jnp.asarray(calib_x, jnp.float32))
        rec = jax.jit(functools.partial(
            _calib_forward, stage_sizes=tuple(stage_sizes)))(*args)
    rec = {k: float(v) for k, v in rec.items()}

    def act_scale(key):
        return np.float32(max(rec[key], 1e-6) / 127.0)

    def qconv(kb):
        wq, ws = quantize_weights_per_channel(kb[0])
        return {"wq": jnp.asarray(wq), "wscale": jnp.asarray(ws),
                "bias": jnp.asarray(kb[1])}

    qt: Dict[str, Any] = {
        "in_scale": jnp.asarray(act_scale("in")),
        "conv1": dict(qconv(folded["conv1"]),
                      out_scale=jnp.asarray(act_scale("conv1"))),
    }
    for name, _, has_down in _block_geometry(stage_sizes):
        blk = folded[name]
        q = {"c1": qconv(blk["c1"]), "c2": qconv(blk["c2"]),
             "c3": qconv(blk["c3"]),
             "a1": jnp.asarray(act_scale(f"{name}/a1")),
             "a2": jnp.asarray(act_scale(f"{name}/a2")),
             "out": jnp.asarray(act_scale(f"{name}/out"))}
        if has_down:
            q["down"] = qconv(blk["down"])
        qt[name] = q
    return qt


# ------------------------------------------------------------- int8 forward
def _dequant_epilogue(acc32, s_in, qc):
    """int32 conv accumulator -> fp32: per-channel scale + bias (fuses into
    the conv epilogue)."""
    return acc32.astype(jnp.float32) * (s_in * qc["wscale"]) + qc["bias"]


def _dense_i8(xq, s_in, qd):
    """int8 x int8 -> int32 dense (B..., I) @ (I, O) on the MXU s8 path,
    with the per-output-channel dequant + bias epilogue."""
    acc = lax.dot_general(
        xq, qd["wq"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_in * qd["wscale"]) + qd["bias"]


def quantize_fe(fe_params, calib_images):
    """Build the int8 FeatureExtractor (models/feature_extractor.py: MLP
    2048 -> 512 -> 256 -> 32, ReLU between layers, reference models.py:6-47)
    for the window-inference serving path.

    The FE's first matmul carries ~98 % of the window path's FLOPs, and the
    bf16 path is trace-measured at 0.70-0.73 MFU (MXU-bound) — the v5e
    s8 x s8 path has 2x the bf16 peak. Same PTQ scheme as the trunk:
    per-output-channel int8 weights, static per-tensor activation scales
    from a host-CPU fp32 calibration pass (platform-independent scales),
    int32 MXU accumulation, fp32 epilogue. ``calib_images``: one
    representative (B, W, 2048) feature batch.
    """
    names = sorted(n for n in fe_params if n.startswith("dense")) + ["out"]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None

    def calib(x):
        rec = [jnp.max(jnp.abs(x))]
        for i, name in enumerate(names):
            p = fe_params[name]
            x = jnp.dot(x, jnp.asarray(p["kernel"], jnp.float32),
                        precision=lax.Precision.HIGHEST) + jnp.asarray(
                p["bias"], jnp.float32)
            if i + 1 < len(names):
                x = jax.nn.relu(x)
                rec.append(jnp.max(jnp.abs(x)))
        return rec

    with jax.default_device(cpu) if cpu is not None else contextlib.nullcontext():
        x0 = jnp.asarray(np.asarray(calib_images, np.float32))
        if cpu is not None:
            x0 = jax.device_put(x0, cpu)
        rec = [float(v) for v in jax.jit(calib)(x0)]

    layers = []
    for i, name in enumerate(names):
        k = np.asarray(fe_params[name]["kernel"], np.float32)
        amax = np.max(np.abs(k), axis=0)
        ws = np.maximum(amax, 1e-12) / 127.0
        wq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
        layers.append({
            "wq": jnp.asarray(wq), "wscale": jnp.asarray(ws.astype(np.float32)),
            "bias": jnp.asarray(fe_params[name]["bias"], jnp.float32),
            "in_scale": jnp.asarray(np.float32(max(rec[i], 1e-6) / 127.0)),
        })
    return {"layers": layers}


def fe_int8_apply(qfe, images):
    """int8 FeatureExtractor forward: (B, W, 2048) fp32 -> (B, W, 32) fp32.

    Drop-in for ``FeatureExtractor.apply`` on the inference path; the last
    layer has no ReLU (matching the module), so its output stays fp32 for
    the downstream concat + window head.

    ``images`` may also be int8 — a feature-store batch already quantized
    by :func:`quantize_fe_input` (layer-0 scale). The serving input read is
    the window path's bandwidth wall (42 MB f32 per 512-window batch), so
    an int8 feature store cuts it 4x; the arithmetic is bit-identical to
    quantizing the fp32 features here."""
    layers = qfe["layers"]
    x = images
    for i, qd in enumerate(layers):
        if x.dtype == jnp.int8:
            xq = x
        else:
            xq = quantize_tensor(jnp.asarray(x, jnp.float32), qd["in_scale"])
        x = _dense_i8(xq, qd["in_scale"], qd)
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


def quantize_fe_input(qfe, images):
    """fp32 feature windows -> the int8 feature-store representation
    consumed by :func:`fe_int8_apply` (layer-0 activation scale)."""
    return quantize_tensor(jnp.asarray(images, jnp.float32),
                           qfe["layers"][0]["in_scale"])


def _block_i8(xq, s_in, q, stride: int, has_down: bool):
    t = _dequant_epilogue(_conv_i8(xq, q["c1"]["wq"], 1, 0), s_in, q["c1"])
    tq = quantize_tensor(jax.nn.relu(t), q["a1"])
    t = _dequant_epilogue(_conv_i8(tq, q["c2"]["wq"], stride, 1),
                          q["a1"], q["c2"])
    tq = quantize_tensor(jax.nn.relu(t), q["a2"])
    t = _dequant_epilogue(_conv_i8(tq, q["c3"]["wq"], 1, 0), q["a2"], q["c3"])
    if has_down:
        res = _dequant_epilogue(_conv_i8(xq, q["down"]["wq"], stride, 0),
                                s_in, q["down"])
    else:
        res = xq.astype(jnp.float32) * s_in
    y = jax.nn.relu(t + res)
    return quantize_tensor(y, q["out"]), q["out"]


def resnet50_int8_apply(qt, x, stage_sizes: Sequence[int] = (3, 4, 6, 3)):
    """int8 trunk forward: preprocessed pixels (B, H, W, 3) fp32 ->
    (B, 4 * width * 2**(len(stage_sizes)-1)) pooled fp32 features.

    Drop-in for ``ResNet50.apply(..., train=False)`` on the serving path
    (same pooled-feature contract as models/resnet.py:85)."""
    xq = quantize_tensor(jnp.asarray(x, jnp.float32), qt["in_scale"])
    y = _dequant_epilogue(_conv_i8(xq, qt["conv1"]["wq"], 2, 3),
                          qt["in_scale"], qt["conv1"])
    yq = quantize_tensor(jax.nn.relu(y), qt["conv1"]["out_scale"])
    yq = _max_pool(yq)
    s = qt["conv1"]["out_scale"]
    for name, stride, has_down in _block_geometry(stage_sizes):
        yq, s = _block_i8(yq, s, qt[name], stride, has_down)
    # final dequant folds into the mean: s * mean(int8)
    return jnp.mean(yq.astype(jnp.float32), axis=(1, 2)) * s
