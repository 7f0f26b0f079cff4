"""Fused ResNet bottleneck-stage inference kernel (the e2e serving trunk).

The serving pipeline (BASELINE.json: pixels -> preprocess -> ResNet-50 ->
features -> window head; reference preprocessing_utils.py:722-823 computes
these features with torchvision resnet50) spends most of its device time in
the trunk's early stages: at batch 128 every bottleneck conv in stage 1
materializes a 205 MB (128, 56, 56, 256) bf16 activation in HBM, so the
XLA path runs ~3 HBM round-trips per block (~2.8 ms of a 9.65 ms step for
stage 1 alone, round-3 profile) against a compute floor of ~1.7 ms.

This module runs a whole STAGE of stride-1 bottleneck blocks as ONE Pallas
kernel: grid=(B,), one image per cell, the activation resident in VMEM
across every block of the stage — HBM traffic drops to one read of the
stage input plus one write of the stage output.

TPU formulation:
- activations ride as (H*W, C) row-major flats (8-aligned for the 56x56 and
  28x28 stages), lanes = channels;
- each 3x3 conv is 9 shifted-row matmuls against a zero-padded VMEM scratch
  (the dilated-tap pattern of ops/tcn_fused.py): tap (dy, dx) reads rows
  p + dy*W + dx, and an iota column mask kills the row-wrap contributions
  at the left/right image edges;
- inference BatchNorm is an affine, so each conv+BN is pre-folded into
  (W', c): W' = W * scale/sqrt(var+eps), c = bias - mean*scale/sqrt(var+eps)
  (fold done in f32 on the host side of the jit, weights cast to the
  compute dtype);
- matmuls are bf16 with f32 accumulation (preferred_element_type), matching
  the XLA trunk's bf16 serving configuration.

Blocks with stride 2 (block 0 of stages 2-4) stay on the XLA conv path;
:func:`resnet50_fused_apply` stitches stem + stride-2 blocks (XLA) and
stride-1 runs (fused kernel) into the exact ResNet50 forward.

MEASURED RESULT (v5e, batch 128, bf16, scripts/bench_resnet_fused.py):
tie with the XLA conv trunk — 9.53 vs 9.42 ms/iter (0.988x), device
rel-l2 1.6e-3 (bf16-level). The device trace attributes 3.86 ms to the
two fused stage kernels vs ~4.1 ms for the same stages on XLA: the HBM
round-trips the fusion removes are bought back by the VPU cost of the
six ±1-column 3x3 taps (every dx=±1 access of the (H*W, 64) row-flat
plane is a sublane rotation — probed at ~1.6 ms/step with taps disabled
— and the shifted-copy formulation that makes the READS aligned pays an
equivalent price writing the copies), plus f=64-wide matmuls that use
half the MXU. XLA's conv path hides its HBM traffic behind async copies
(3.3 ms of copy-start overlap in the trace) well enough that the
bandwidth saving nets zero. Kept as a tested optional path (it is exact;
tests/test_resnet_fused.py), NOT wired into the default serving graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only namespace; present in all recent jax
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

BN_EPS = 1e-5  # flax.linen.BatchNorm default, matches torchvision


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------


def fold_conv_bn(kernel, bn_params, bn_stats, eps: float = BN_EPS):
    """(conv kernel, inference BN) -> (folded kernel, bias), both f32.

    y = BN(conv(x)) = conv(x) * a + c with a = scale/sqrt(var+eps),
    c = bias - mean*a; a folds into the kernel's output-channel axis."""
    a = (bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)).astype(
        jnp.float32)
    c = (bn_params["bias"] - bn_stats["mean"] * a).astype(jnp.float32)
    return kernel.astype(jnp.float32) * a, c


def fold_bottleneck_params(block_params, block_stats):
    """Fold one Bottleneck block's (params, batch_stats) into the kernel's
    operand dict: w1 (Cin,f), w2 (9,f,f), w3 (f,4f) folded kernels plus
    (1,·) biases; optional wd/cd for the downsample projection."""
    w1, c1 = fold_conv_bn(block_params["conv1"]["kernel"],
                          block_params["bn1"], block_stats["bn1"])
    w2, c2 = fold_conv_bn(block_params["conv2"]["kernel"],
                          block_params["bn2"], block_stats["bn2"])
    w3, c3 = fold_conv_bn(block_params["conv3"]["kernel"],
                          block_params["bn3"], block_stats["bn3"])
    f = w1.shape[-1]
    out = {
        "w1": w1[0, 0], "c1": c1.reshape(1, f),
        "w2": w2.reshape(9, f, f), "c2": c2.reshape(1, f),
        "w3": w3[0, 0], "c3": c3.reshape(1, 4 * f),
    }
    if "down_conv" in block_params:
        wd, cd = fold_conv_bn(block_params["down_conv"]["kernel"],
                              block_params["down_bn"],
                              block_stats["down_bn"])
        out["wd"] = wd[0, 0]
        out["cd"] = cd.reshape(1, 4 * f)
    return out


# ---------------------------------------------------------------------------
# fused stage kernel
# ---------------------------------------------------------------------------


def _stage_kernel(*refs, Wr: int, HW: int, nb: int, has_down, f: int,
                  dtype):
    """One grid cell = one image through ``nb`` stride-1 bottleneck blocks.

    refs: x, then per block (w1, c1, w2, c2, w3, c3 [, wd, cd]), out, and
    THREE y1 scratches with halo P = Wr + 8: the dx = -1/0/+1 tap groups
    each read an own copy of y1 stored at offset P - dx, so every tap
    slice lands 8-aligned (Wr % 8 == 0). Writing the two shifted copies
    costs 2 misaligned (sublane-rotate) stores per block; slicing the taps
    directly cost 6 misaligned loads per block (~1 VPU pass over the whole
    (HW, f) plane each — measured ~1.6 ms/step of the batch-128 trunk).
    """
    x_ref = refs[0]
    out_ref = refs[-4]
    ypl_ref, yp_ref, ypp_ref = refs[-3:]
    wrefs = refs[1:-4]

    P = Wr + 8
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # one-time halo zeroing, one row past P on each side: the shifted
        # copies write [P-dx, P-dx+HW), leaving row P (ypl) and row
        # P+HW-1 (ypp) to the zero halo
        for r in (ypl_ref, yp_ref, ypp_ref):
            r[pl.ds(0, P + 1)] = jnp.zeros((P + 1, f), dtype)
            r[pl.ds(P + HW - 1, P + 1)] = jnp.zeros((P + 1, f), dtype)

    # left/right image-edge masks over flattened rows (2D iota on TPU)
    col = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % Wr
    mask_l = (col > 0).astype(jnp.float32)        # dx = -1 invalid at col 0
    mask_r = (col < Wr - 1).astype(jnp.float32)   # dx = +1 invalid at col W-1

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = x_ref[0]
    off = 0
    for b in range(nb):
        w1_ref, c1_ref, w2_ref, c2_ref, w3_ref, c3_ref = wrefs[off:off + 6]
        # 1x1 reduce + BN + relu
        y1 = jnp.maximum(mm(x, w1_ref[:]) + c1_ref[:], 0.0).astype(dtype)
        yp_ref[pl.ds(P, HW)] = y1
        ypl_ref[pl.ds(P + 1, HW)] = y1   # y1[q-1] at row P+q
        ypp_ref[pl.ds(P - 1, HW)] = y1   # y1[q+1] at row P+q
        # 3x3 as 9 shifted-row matmuls (all slices aligned); dx-grouped
        # edge masking
        acc = jnp.broadcast_to(c2_ref[:], (HW, f)).astype(jnp.float32)
        for dx, buf in ((-1, ypl_ref), (0, yp_ref), (1, ypp_ref)):
            part = None
            for dy in (-1, 0, 1):
                tap = mm(buf[pl.ds(P + dy * Wr, HW)],
                         w2_ref[3 * (dy + 1) + (dx + 1)])
                part = tap if part is None else part + tap
            if dx == -1:
                part = part * mask_l
            elif dx == 1:
                part = part * mask_r
            acc = acc + part
        y2 = jnp.maximum(acc, 0.0).astype(dtype)
        # 1x1 expand + residual (+ optional stride-1 projection) + relu
        z = mm(y2, w3_ref[:]) + c3_ref[:]
        if has_down[b]:
            wd_ref, cd_ref = wrefs[off + 6:off + 8]
            res = mm(x, wd_ref[:]) + cd_ref[:]
        else:
            res = x.astype(jnp.float32)
        x = jnp.maximum(z + res, 0.0).astype(dtype)
        off += 8 if has_down[b] else 6
    out_ref[0] = x


def fused_bottleneck_stage(x, blocks: Sequence[Dict[str, Any]], *, Wr: int,
                           dtype=jnp.bfloat16, interpret=None):
    """Run stride-1 bottleneck blocks fused in VMEM.

    x: (B, H*W, C_in) with H*W a multiple of 8 and W-row length ``Wr``;
    ``blocks``: folded operand dicts from :func:`fold_bottleneck_params`
    (every block stride 1; a 'wd' key adds the stride-1 projection of the
    stage-1 head block). Returns (B, H*W, 4f) in ``dtype``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, HW, Cin = x.shape
    if HW % 8:
        raise ValueError(f"H*W={HW} must be 8-aligned for the row-flat form")
    f = blocks[0]["w1"].shape[-1]
    nb = len(blocks)
    has_down = tuple("wd" in blk for blk in blocks)

    in_arrays = [x.astype(dtype)]
    in_specs = [pl.BlockSpec((1, HW, Cin), lambda i: (i, 0, 0))]
    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    for blk in blocks:
        names = ("w1", "c1", "w2", "c2", "w3", "c3")
        if "wd" in blk:
            names += ("wd", "cd")
        for name in names:
            arr = blk[name]
            # biases stay f32 (added to the f32 accumulators)
            a = arr if name.startswith("c") else arr.astype(dtype)
            in_arrays.append(a)
            in_specs.append(pl.BlockSpec(a.shape, const3 if a.ndim == 3
                                         else const2))

    out = pl.pallas_call(
        functools.partial(_stage_kernel, Wr=Wr, HW=HW, nb=nb,
                          has_down=has_down, f=f, dtype=dtype),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, HW, 4 * f), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HW, 4 * f), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM(((Wr + 8) + HW + (Wr + 8), f), dtype)] * 3,
        interpret=interpret,
    )(*in_arrays)
    return out


# ---------------------------------------------------------------------------
# full-trunk inference apply (XLA stem / stride-2 blocks + fused stages)
# ---------------------------------------------------------------------------


def _conv_bn(x, kernel, c, stride: int, dtype):
    # bias add in the compute dtype: an f32 intermediate would double the
    # bandwidth of every downstream elementwise fusion (measured ~0.8 ms
    # across stages 3-4 of the batch-128 trunk)
    pad = (kernel.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + c.astype(dtype)


def _block_xla(x, blk_params, blk_stats, stride: int, dtype):
    """One Bottleneck block on the XLA conv path (folded BN), exactly the
    models/resnet.py:31-53 graph at inference."""
    w1, c1 = fold_conv_bn(blk_params["conv1"]["kernel"], blk_params["bn1"],
                          blk_stats["bn1"])
    w2, c2 = fold_conv_bn(blk_params["conv2"]["kernel"], blk_params["bn2"],
                          blk_stats["bn2"])
    w3, c3 = fold_conv_bn(blk_params["conv3"]["kernel"], blk_params["bn3"],
                          blk_stats["bn3"])
    y = jnp.maximum(_conv_bn(x, w1, c1, 1, dtype), 0.0)
    y = jnp.maximum(_conv_bn(y, w2, c2, stride, dtype), 0.0)
    y = _conv_bn(y, w3, c3, 1, dtype)
    if "down_conv" in blk_params:
        wd, cd = fold_conv_bn(blk_params["down_conv"]["kernel"],
                              blk_params["down_bn"], blk_stats["down_bn"])
        res = _conv_bn(x, wd, cd, stride, dtype)
    else:
        res = x
    return jnp.maximum(y + res, 0.0)


def resnet50_fused_apply(variables, x, *, stage_sizes=(3, 4, 6, 3),
                         dtype=jnp.bfloat16,
                         fused_stages=(0, 1), interpret=None):
    """ResNet-50 trunk inference with VMEM-fused stride-1 stages.

    Same math as ``ResNet50().apply(variables, x, train=False)`` (folded
    inference BN; bf16-level rounding differences only): (B,H,W,3) pixels ->
    (B, 2048) pooled f32 features. ``fused_stages`` indexes stages (0-based)
    whose stride-1 blocks run through :func:`fused_bottleneck_stage`; a
    stage is silently kept on XLA when its spatial flat isn't 8-aligned.
    """
    p = variables["params"]
    s = variables["batch_stats"]
    x = x.astype(dtype)
    w0, c0 = fold_conv_bn(p["conv1"]["kernel"], p["bn1"], s["bn1"])
    y = jax.lax.conv_general_dilated(
        x, w0.astype(dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y + c0.astype(dtype), 0.0)
    y = jax.lax.reduce_window(
        y, jnp.array(-jnp.inf, dtype), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))

    for stage, n_blocks in enumerate(stage_sizes):
        first_fused = 0 if stage == 0 else 1   # block 0 strides 2 on XLA
        if stage > 0:
            y = _block_xla(y, p[f"layer{stage + 1}_0"],
                           s[f"layer{stage + 1}_0"], 2, dtype)
        B, H, W, C = y.shape
        rest = range(first_fused, n_blocks)
        if stage in fused_stages and (H * W) % 8 == 0 and len(rest):
            blocks = [fold_bottleneck_params(p[f"layer{stage + 1}_{b}"],
                                             s[f"layer{stage + 1}_{b}"])
                      for b in rest]
            flat = y.reshape(B, H * W, C)
            flat = fused_bottleneck_stage(flat, blocks, Wr=W, dtype=dtype,
                                          interpret=interpret)
            y = flat.reshape(B, H, W, flat.shape[-1])
        else:
            for b in rest:
                y = _block_xla(y, p[f"layer{stage + 1}_{b}"],
                               s[f"layer{stage + 1}_{b}"], 1, dtype)
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))
