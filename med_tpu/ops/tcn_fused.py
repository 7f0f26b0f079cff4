"""Fused dilated-residual TCN stack (the COG/TeCNo hot path).

A TCN stage (reference models_TCN.py:76-165, models_COG.py:SingleStageModel1)
is ``num_layers`` dilated residual blocks, each

    h_{i+1} = h_i + dropout( W1 · relu( dconv3_{2^i}(h_i) + b3 ) + b1 )

at 64 channels. Per block that is 4 tiny matmuls plus elementwise glue; a
COG training step runs 82 blocks (slow 11+3x10 at T, fast 11+3x10 at T/16)
forward *and* backward, so the step is latency-bound on op count, not FLOPs
(round-1 measurement: 33.8 ms/step at T=1024 while the matmul work is
~4 GFLOP ≈ 0.1 ms of MXU time).

This module collapses one whole stage into ONE Pallas kernel per direction:

- forward: ``grid=(L,)`` — TPU grids run sequentially, so the activation is
  carried across layers in a VMEM scratch buffer padded by ±2·d_max rows of
  zeros; each dilated tap is a dynamic-start row slice of that buffer feeding
  a (T, C)x(C, C) MXU matmul. Dilations are the MS-TCN 2^i schedule, derived
  in-kernel from the grid index (no SMEM tables).
- backward: a second ``grid=(L,)`` kernel walking layers in reverse. The
  saving forward emits BOTH per-layer inputs h and post-relu activations y
  as residual blocks: re-materializing y in the backward cost 3 HIGHEST
  matmuls per layer (~25% of the backward's MXU work at T=1024) against an
  (L, T, C) HBM write+read — and the y block replaces the recompute's VMEM
  accumulator, so the per-cell footprint is unchanged. The kernel
  accumulates per-layer dW3/db3/dW1/db1 into their output blocks and
  carries dh in scratch.
- dropout: masks are Bernoulli(keep=0.5) uint8 planes precomputed by the
  caller (one fused XLA rng op) and passed as an input, so the same mask is
  seen by forward and backward by construction and the kernel stays
  runnable in interpret mode (pltpu.prng_* has no CPU lowering).

The custom VJP uses a save-free primal (inference does not write residuals)
and a saving forward for autodiff. ``dilated_stack_xla`` is the lax-level
oracle used by the CPU tests.

Shapes:  x (T, C);  w3 (L, 3, C, C);  b3 (L, C);  w1 (L, C, C);  b1 (L, C);
mask (L, T, C) uint8 or None.  Layer i uses dilation 2**i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only namespace; present in all recent jax
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def fused_stack_fits(T: int, pad: int, train: bool) -> bool:
    """Whether the fused stack kernels fit the TPU's 16M scoped-VMEM budget
    at sequence length ``T`` (``pad`` = 2**max layer count). Callers fall
    back to the exact XLA layer loop beyond the boundary instead of dying
    in Mosaic's allocator.

    Point-fit to measured scoped allocations on v5e (the whole-sequence
    body is the design: one grid cell = one layer, activation carried in
    VMEM, so VMEM scales with T): train bwd 27.10M @ (T=4096, pad=256),
    16.79M @ (T=2048, pad=2048), 18.11M @ multistack (T=2048, pad=2048),
    OK @ (T=2048, pad=256) and multistack (T=1536, pad=2048); eval fwd
    20.99M @ (T=6144, pad=256), OK @ (T=4096, pad=256). Rows are physical
    128-lane f32 rows (C=64 lane-pads 2x) = 512 B."""
    a = 11.5 if train else 5.2
    est = 512.0 * (a * T + 1.7 * (T + 2 * pad))
    return est <= 15.5e6


def _shifts(d, causal: bool):
    """Per-tap input delays: out[t] = sum_j x[t - s_j] @ W_j.

    causal: left-pad 2d (reference models_TCN.py:110-118) -> s = (2d, d, 0);
    acausal: symmetric pad d -> s = (d, 0, -d).
    """
    if causal:
        return (2 * d, d, 0 * d)
    return (d, 0 * d, -d)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, causal: bool, pad: int, use_mask: bool, save: bool):
    """One grid step = one dilated residual layer.

    refs: x, w3, b3, w1, b1 [, mask], h_out [, h_saved, y_saved], hp_scratch.
    hp scratch rows: [0, pad) zeros | [pad, pad+T) h | [pad+T, pad+2T?) zeros.
    ``save`` also emits the post-relu activations y: the backward consumes
    them directly instead of re-materializing relu(dconv(h)) — 3 HIGHEST
    matmuls per layer traded for one (L, T, C) residual write+read.
    """
    if use_mask:
        x_ref, w3_ref, b3_ref, w1_ref, b1_ref, mask_ref = refs[:6]
        outs = refs[6:-1]
    else:
        x_ref, w3_ref, b3_ref, w1_ref, b1_ref = refs[:5]
        outs = refs[5:-1]
    if save:
        h_out_ref, h_saved_ref, y_saved_ref = outs
    else:
        (h_out_ref,) = outs
    hp_ref = refs[-1]

    T, C = x_ref.shape
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hp_ref[pl.ds(0, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad + T, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad, T)] = x_ref[:]

    h = hp_ref[pl.ds(pad, T)]
    if save:
        h_saved_ref[0] = h

    d = jnp.int32(1) << i
    acc = b3_ref[0]  # (1, C) broadcasts over (T, C)
    for j, s in enumerate(_shifts(d, causal)):
        acc = acc + jax.lax.dot_general(
            hp_ref[pl.ds(pad - s, T)], w3_ref[0, j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    y = jnp.maximum(acc, 0.0)
    if save:
        y_saved_ref[0] = y
    z = jax.lax.dot_general(
        y, w1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + b1_ref[0]
    if use_mask:
        # uint8 -> int32 -> f32: Mosaic has no direct u8->f32 cast
        z = z * (mask_ref[0].astype(jnp.int32).astype(jnp.float32) * 2.0)
    hn = h + z
    hp_ref[pl.ds(pad, T)] = hn
    h_out_ref[:] = hn


def _fwd_call(x, w3, b3, w1, b1, mask, *, causal: bool, save: bool,
              interpret: bool):
    L, _, C, _ = w3.shape
    T = x.shape[0]
    pad = 2 ** L  # covers the max tap delay 2 * 2^(L-1) on both sides

    in_arrays = [x, w3, b3.reshape(L, 1, C), w1, b1.reshape(L, 1, C)]
    in_specs = [
        pl.BlockSpec((T, C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3, C, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, C, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
    ]
    if mask is not None:
        in_arrays.append(mask)
        in_specs.append(pl.BlockSpec((1, T, C), lambda i: (i, 0, 0)))

    out_shape = [jax.ShapeDtypeStruct((T, C), jnp.float32)]
    out_specs = [pl.BlockSpec((T, C), lambda i: (0, 0))]
    if save:
        out_shape += [jax.ShapeDtypeStruct((L, T, C), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, T, C), lambda i: (i, 0, 0))] * 2

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal, pad=pad,
                          use_mask=mask is not None, save=save),
        grid=(L,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((pad + T + pad, C), jnp.float32)],
        interpret=interpret,
    )(*in_arrays)
    return out if save else out[0]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, causal: bool, pad: int, L: int, use_mask: bool):
    """Grid step i processes layer l = L-1-i.

    refs: g, h_saved, y_saved, w3, w1 [, mask],
          dx, dw3, db3, dw1, db1, dh_scr, hp_scr, ap_scr.
    y (the post-relu activations) rides in from the forward's residuals —
    re-materializing it here cost 3 HIGHEST matmuls per layer (and b3).
    """
    if use_mask:
        g_ref, h_ref, y_ref, w3_ref, w1_ref, mask_ref = refs[:6]
        rest = refs[6:]
    else:
        g_ref, h_ref, y_ref, w3_ref, w1_ref = refs[:5]
        rest = refs[5:]
    dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dh_scr, hp_scr, ap_scr = rest

    T, C = g_ref.shape
    i = pl.program_id(0)
    l = (L - 1) - i
    d = jnp.int32(1) << l

    @pl.when(i == 0)
    def _():
        dh_scr[:] = g_ref[:]
        zeros = jnp.zeros((pad, C), jnp.float32)
        hp_scr[pl.ds(0, pad)] = zeros
        hp_scr[pl.ds(pad + T, pad)] = zeros
        ap_scr[pl.ds(0, pad)] = zeros
        ap_scr[pl.ds(pad + T, pad)] = zeros

    dh_out = dh_scr[:]
    h = h_ref[0]
    hp_scr[pl.ds(pad, T)] = h

    shifts = _shifts(d, causal)
    y = y_ref[0]

    dz = (
        dh_out * (mask_ref[0].astype(jnp.int32).astype(jnp.float32) * 2.0)
        if use_mask else dh_out
    )
    # dW1[a,b] = sum_t y[t,a] dz[t,b] ; dy = dz @ W1^T
    dw1_ref[0] = jax.lax.dot_general(
        y, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )
    db1_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    dy = jax.lax.dot_general(
        dz, w1_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )
    da = jnp.where(y > 0.0, dy, 0.0)
    db3_ref[0] = jnp.sum(da, axis=0, keepdims=True)

    ap_scr[pl.ds(pad, T)] = da
    dhc = dh_out
    for j, s in enumerate(shifts):
        # dW3_j[a,b] = sum_t h[t-s,a] da[t,b]
        dw3_ref[0, j] = jax.lax.dot_general(
            hp_scr[pl.ds(pad - s, T)], da,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # dh[u] += da[u+s] @ W3_j^T
        dhc = dhc + jax.lax.dot_general(
            ap_scr[pl.ds(pad + s, T)], w3_ref[0, j],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dh_scr[:] = dhc
    dx_ref[:] = dhc


def _bwd_call(g, h_saved, y_saved, w3, w1, mask, *, causal: bool,
              interpret: bool):
    L, _, C, _ = w3.shape
    T = g.shape[0]
    pad = 2 ** L

    rev = lambda i: (L - 1 - i, 0, 0)  # noqa: E731
    rev4 = lambda i: (L - 1 - i, 0, 0, 0)  # noqa: E731

    in_arrays = [g, h_saved, y_saved, w3, w1]
    in_specs = [
        pl.BlockSpec((T, C), lambda i: (0, 0)),
        pl.BlockSpec((1, T, C), rev),
        pl.BlockSpec((1, T, C), rev),
        pl.BlockSpec((1, 3, C, C), rev4),
        pl.BlockSpec((1, C, C), rev),
    ]
    if mask is not None:
        in_arrays.append(mask)
        in_specs.append(pl.BlockSpec((1, T, C), rev))

    out_shape = (
        jax.ShapeDtypeStruct((T, C), jnp.float32),      # dx
        jax.ShapeDtypeStruct((L, 3, C, C), jnp.float32),  # dw3
        jax.ShapeDtypeStruct((L, 1, C), jnp.float32),   # db3
        jax.ShapeDtypeStruct((L, C, C), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((L, 1, C), jnp.float32),   # db1
    )
    out_specs = (
        pl.BlockSpec((T, C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3, C, C), rev4),
        pl.BlockSpec((1, 1, C), rev),
        pl.BlockSpec((1, C, C), rev),
        pl.BlockSpec((1, 1, C), rev),
    )
    dx, dw3, db3, dw1, db1 = pl.pallas_call(
        functools.partial(_bwd_kernel, causal=causal, pad=pad, L=L,
                          use_mask=mask is not None),
        grid=(L,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((T, C), jnp.float32),
            pltpu.VMEM((pad + T + pad, C), jnp.float32),
            pltpu.VMEM((pad + T + pad, C), jnp.float32),
        ],
        interpret=interpret,
    )(*in_arrays)
    return dx, dw3, db3.reshape(L, C), dw1, db1.reshape(L, C)


# ---------------------------------------------------------------------------
# custom-VJP entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_train(causal, interpret, x, w3, b3, w1, b1, mask):
    return _fwd_call(x, w3, b3, w1, b1, mask, causal=causal, save=False,
                     interpret=interpret)


def _fused_train_fwd(causal, interpret, x, w3, b3, w1, b1, mask):
    h_out, h_saved, y_saved = _fwd_call(x, w3, b3, w1, b1, mask,
                                        causal=causal, save=True,
                                        interpret=interpret)
    return h_out, (h_saved, y_saved, w3, w1, mask)


def _fused_train_bwd(causal, interpret, res, g):
    h_saved, y_saved, w3, w1, mask = res
    dx, dw3, db3, dw1, db1 = _bwd_call(g, h_saved, y_saved, w3, w1, mask,
                                       causal=causal, interpret=interpret)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dx, dw3, db3, dw1, db1, dmask


_fused_train.defvjp(_fused_train_fwd, _fused_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_eval(causal, interpret, x, w3, b3, w1, b1):
    return _fwd_call(x, w3, b3, w1, b1, None, causal=causal, save=False,
                     interpret=interpret)


def _fused_eval_fwd(causal, interpret, x, w3, b3, w1, b1):
    h_out, h_saved, y_saved = _fwd_call(x, w3, b3, w1, b1, None,
                                        causal=causal, save=True,
                                        interpret=interpret)
    return h_out, (h_saved, y_saved, w3, w1)


def _fused_eval_bwd(causal, interpret, res, g):
    h_saved, y_saved, w3, w1 = res
    return _bwd_call(g, h_saved, y_saved, w3, w1, None, causal=causal,
                     interpret=interpret)


_fused_eval.defvjp(_fused_eval_fwd, _fused_eval_bwd)


def dilated_residual_stack(x, w3, b3, w1, b1, *, causal: bool = True,
                           mask=None, interpret=None):
    """Run a whole dilated-residual stack as one fused kernel per direction.

    x (T, C) float32; layer i uses dilation 2**i. ``mask`` is the per-layer
    Bernoulli(0.5) keep mask (L, T, C) uint8 (train) or None (eval).
    ``interpret=None`` auto-selects interpret mode off-TPU so the same code
    path is exercised by the CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)
    if mask is None:
        return _fused_eval(causal, interpret, x, w3, b3, w1, b1)
    return _fused_train(causal, interpret, x, w3, b3, w1, b1, mask)


# ---------------------------------------------------------------------------
# merged MULTI-STAGE stack: the COG slow path (TCN + num_R refinement
# stages) is 4 back-to-back residual stacks with NO ops between stages
# (R stages take features directly, models_COG.py:482-524), so all
# L0 + num_R*Lr layers run in ONE kernel launch per direction instead of 4
# — amortizing the ~40 us fixed cost per pallas_call (round-2 profile:
# 8 stack launches were 0.66 ms of a 2.8 ms step against ~4 us of MXU work
# each). Stage outputs (the FPN inputs) are emitted as an (S, T, C) output
# whose block index is the stage of the current layer: every layer writes
# its stage's block, so the stage's LAST layer leaves the stage output.
#
# Stage layout is (L0, Lr, Lr, …): dilation and stage index derive from the
# grid index arithmetically (local = i < L0 ? i : (i - L0) % Lr), so no
# scalar-prefetch tables are needed.
# ---------------------------------------------------------------------------


def _stage_of(i, L0, Lr):
    return jnp.where(i < L0, 0, 1 + (i - L0) // Lr)


def _local_of(i, L0, Lr):
    return jnp.where(i < L0, i, (i - L0) % Lr)


def _multi_fwd_kernel(*refs, causal: bool, pad: int, L0: int, Lr: int,
                      use_mask: bool, save: bool):
    if use_mask:
        x_ref, w3_ref, b3_ref, w1_ref, b1_ref, mask_ref = refs[:6]
        outs = refs[6:-1]
    else:
        x_ref, w3_ref, b3_ref, w1_ref, b1_ref = refs[:5]
        outs = refs[5:-1]
    if save:
        hs_ref, h_saved_ref, y_saved_ref = outs
    else:
        (hs_ref,) = outs
    hp_ref = refs[-1]

    T, C = x_ref.shape
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hp_ref[pl.ds(0, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad + T, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad, T)] = x_ref[:]

    h = hp_ref[pl.ds(pad, T)]
    if save:
        h_saved_ref[0] = h

    d = jnp.int32(1) << _local_of(i, L0, Lr)
    acc = b3_ref[0]
    for j, s in enumerate(_shifts(d, causal)):
        acc = acc + jax.lax.dot_general(
            hp_ref[pl.ds(pad - s, T)], w3_ref[0, j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    y = jnp.maximum(acc, 0.0)
    if save:
        y_saved_ref[0] = y
    z = jax.lax.dot_general(
        y, w1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + b1_ref[0]
    if use_mask:
        z = z * (mask_ref[0].astype(jnp.int32).astype(jnp.float32) * 2.0)
    hn = h + z
    hp_ref[pl.ds(pad, T)] = hn
    hs_ref[0] = hn   # stage block: last layer of the stage wins


def _multi_fwd_call(x, w3, b3, w1, b1, mask, *, causal: bool, L0: int,
                    Lr: int, save: bool, interpret: bool):
    Lt = w3.shape[0]
    C = w3.shape[2]
    T = x.shape[0]
    S = 1 + (Lt - L0) // max(Lr, 1) if Lt > L0 else 1
    pad = 2 ** max(L0, Lr)

    stage_map = lambda i: (_stage_of(i, L0, Lr), 0, 0)  # noqa: E731

    in_arrays = [x, w3, b3.reshape(Lt, 1, C), w1, b1.reshape(Lt, 1, C)]
    in_specs = [
        pl.BlockSpec((T, C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3, C, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, C, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
    ]
    if mask is not None:
        in_arrays.append(mask)
        in_specs.append(pl.BlockSpec((1, T, C), lambda i: (i, 0, 0)))

    out_shape = [jax.ShapeDtypeStruct((S, T, C), jnp.float32)]
    out_specs = [pl.BlockSpec((1, T, C), stage_map)]
    if save:
        out_shape += [jax.ShapeDtypeStruct((Lt, T, C), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, T, C), lambda i: (i, 0, 0))] * 2

    out = pl.pallas_call(
        functools.partial(_multi_fwd_kernel, causal=causal, pad=pad, L0=L0,
                          Lr=Lr, use_mask=mask is not None, save=save),
        grid=(Lt,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((pad + T + pad, C), jnp.float32)],
        interpret=interpret,
    )(*in_arrays)
    return out if save else out[0]


def _multi_bwd_kernel(*refs, causal: bool, pad: int, Lt: int, L0: int,
                      Lr: int, use_mask: bool):
    """Grid step i processes layer l = Lt-1-i; the stage-output cotangent
    g[stage(l)] joins dh when l is its stage's LAST layer. y rides in from
    the forward's residuals (see _bwd_kernel)."""
    if use_mask:
        g_ref, h_ref, y_ref, w3_ref, w1_ref, mask_ref = refs[:6]
        rest = refs[6:]
    else:
        g_ref, h_ref, y_ref, w3_ref, w1_ref = refs[:5]
        rest = refs[5:]
    dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dh_scr, hp_scr, ap_scr = rest

    T, C = dx_ref.shape
    i = pl.program_id(0)
    l = (Lt - 1) - i
    local = _local_of(l, L0, Lr)
    d = jnp.int32(1) << local

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros((T, C), jnp.float32)
        zeros = jnp.zeros((pad, C), jnp.float32)
        hp_scr[pl.ds(0, pad)] = zeros
        hp_scr[pl.ds(pad + T, pad)] = zeros
        ap_scr[pl.ds(0, pad)] = zeros
        ap_scr[pl.ds(pad + T, pad)] = zeros

    stage_len = jnp.where(l < L0, L0, Lr)
    dh_out = dh_scr[:]
    is_end = local == stage_len - 1
    dh_out = dh_out + jnp.where(is_end, 1.0, 0.0) * g_ref[0]

    h = h_ref[0]
    hp_scr[pl.ds(pad, T)] = h

    shifts = _shifts(d, causal)
    y = y_ref[0]

    dz = (
        dh_out * (mask_ref[0].astype(jnp.int32).astype(jnp.float32) * 2.0)
        if use_mask else dh_out
    )
    dw1_ref[0] = jax.lax.dot_general(
        y, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    db1_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    dy = jax.lax.dot_general(
        dz, w1_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    da = jnp.where(y > 0.0, dy, 0.0)
    db3_ref[0] = jnp.sum(da, axis=0, keepdims=True)

    ap_scr[pl.ds(pad, T)] = da
    dhc = dh_out
    for j, s in enumerate(shifts):
        dw3_ref[0, j] = jax.lax.dot_general(
            hp_scr[pl.ds(pad - s, T)], da,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dhc = dhc + jax.lax.dot_general(
            ap_scr[pl.ds(pad + s, T)], w3_ref[0, j],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dh_scr[:] = dhc
    dx_ref[:] = dhc


def _multi_bwd_call(g, h_saved, y_saved, w3, w1, mask, *, causal: bool,
                    L0: int, Lr: int, interpret: bool):
    Lt = w3.shape[0]
    C = w3.shape[2]
    T = g.shape[1]
    pad = 2 ** max(L0, Lr)

    rev = lambda i: (Lt - 1 - i, 0, 0)  # noqa: E731
    rev4 = lambda i: (Lt - 1 - i, 0, 0, 0)  # noqa: E731
    g_map = lambda i: (_stage_of(Lt - 1 - i, L0, Lr), 0, 0)  # noqa: E731

    in_arrays = [g, h_saved, y_saved, w3, w1]
    in_specs = [
        pl.BlockSpec((1, T, C), g_map),
        pl.BlockSpec((1, T, C), rev),
        pl.BlockSpec((1, T, C), rev),
        pl.BlockSpec((1, 3, C, C), rev4),
        pl.BlockSpec((1, C, C), rev),
    ]
    if mask is not None:
        in_arrays.append(mask)
        in_specs.append(pl.BlockSpec((1, T, C), rev))

    out_shape = (
        jax.ShapeDtypeStruct((T, C), jnp.float32),
        jax.ShapeDtypeStruct((Lt, 3, C, C), jnp.float32),
        jax.ShapeDtypeStruct((Lt, 1, C), jnp.float32),
        jax.ShapeDtypeStruct((Lt, C, C), jnp.float32),
        jax.ShapeDtypeStruct((Lt, 1, C), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((T, C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3, C, C), rev4),
        pl.BlockSpec((1, 1, C), rev),
        pl.BlockSpec((1, C, C), rev),
        pl.BlockSpec((1, 1, C), rev),
    )
    dx, dw3, db3, dw1, db1 = pl.pallas_call(
        functools.partial(_multi_bwd_kernel, causal=causal, pad=pad, Lt=Lt,
                          L0=L0, Lr=Lr, use_mask=mask is not None),
        grid=(Lt,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((T, C), jnp.float32),
            pltpu.VMEM((pad + T + pad, C), jnp.float32),
            pltpu.VMEM((pad + T + pad, C), jnp.float32),
        ],
        interpret=interpret,
    )(*in_arrays)
    return dx, dw3, db3.reshape(Lt, C), dw1, db1.reshape(Lt, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_multi_train(causal, interpret, L0, Lr, x, w3, b3, w1, b1, mask):
    return _multi_fwd_call(x, w3, b3, w1, b1, mask, causal=causal, L0=L0,
                           Lr=Lr, save=False, interpret=interpret)


def _fused_multi_train_fwd(causal, interpret, L0, Lr, x, w3, b3, w1, b1, mask):
    hs, h_saved, y_saved = _multi_fwd_call(x, w3, b3, w1, b1, mask,
                                           causal=causal, L0=L0, Lr=Lr,
                                           save=True, interpret=interpret)
    return hs, (h_saved, y_saved, w3, w1, mask)


def _fused_multi_train_bwd(causal, interpret, L0, Lr, res, g):
    h_saved, y_saved, w3, w1, mask = res
    dx, dw3, db3, dw1, db1 = _multi_bwd_call(
        g, h_saved, y_saved, w3, w1, mask, causal=causal, L0=L0, Lr=Lr,
        interpret=interpret)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dx, dw3, db3, dw1, db1, dmask


_fused_multi_train.defvjp(_fused_multi_train_fwd, _fused_multi_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_multi_eval(causal, interpret, L0, Lr, x, w3, b3, w1, b1):
    return _multi_fwd_call(x, w3, b3, w1, b1, None, causal=causal, L0=L0,
                           Lr=Lr, save=False, interpret=interpret)


def _fused_multi_eval_fwd(causal, interpret, L0, Lr, x, w3, b3, w1, b1):
    hs, h_saved, y_saved = _multi_fwd_call(x, w3, b3, w1, b1, None,
                                           causal=causal, L0=L0, Lr=Lr,
                                           save=True, interpret=interpret)
    return hs, (h_saved, y_saved, w3, w1)


def _fused_multi_eval_bwd(causal, interpret, L0, Lr, res, g):
    h_saved, y_saved, w3, w1 = res
    return _multi_bwd_call(g, h_saved, y_saved, w3, w1, None, causal=causal,
                           L0=L0, Lr=Lr, interpret=interpret)


_fused_multi_eval.defvjp(_fused_multi_eval_fwd, _fused_multi_eval_bwd)


def dilated_residual_multistack(x, w3, b3, w1, b1, L0: int, Lr: int, *,
                                causal: bool = True, mask=None,
                                interpret=None):
    """Run a SEQUENCE of residual stacks (layer counts L0, Lr, Lr, …) as one
    fused kernel per direction, returning the (S, T, C) stage outputs.

    x (T, C); w3 (Ltot, 3, C, C) etc. are the per-stage stacked weights
    concatenated along the layer axis; ``mask`` is the concatenated
    (Ltot, T, C) uint8 dropout keep-mask (train) or None (eval). Layer i
    uses dilation 2**(local index within its stage)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)
    if mask is None:
        return _fused_multi_eval(causal, interpret, L0, Lr, x, w3, b3, w1, b1)
    return _fused_multi_train(causal, interpret, L0, Lr, x, w3, b3, w1, b1,
                              mask)


# ---------------------------------------------------------------------------
# PER-STAGE-OPERAND multistack: same math as dilated_residual_multistack but
# the stage weight stacks (and dropout masks) ride in as SEPARATE pallas
# operands instead of host-side jnp.concatenate inputs. The concats were
# ~65 us/step of the COG profile and their VJP added ~45 us of grad-splitting
# slices; here the cotangents are emitted as per-stage outputs directly.
#
# Mechanics:
# - stage-s operands use CLAMPED index maps (clip(i - start_s, 0, L_s-1)):
#   out-of-stage cells revisit a constant block index, so Mosaic skips the
#   refetch (inputs) and defers the writeback (outputs) — per-cell DMA
#   traffic matches the concatenated version.
# - the kernel copies the ACTIVE stage's weight blocks into VMEM scratch
#   under @pl.when(stage == s) (one small copy per cell), so the compute
#   body stays single-instanced.
# - backward dW/db writes are @pl.when-guarded per stage. Out-of-stage cells
#   never write their clamped block: the pre-owner visitors' undefined block
#   is fully overwritten by the owner (every owner writes the whole block),
#   and post-owner visitors revisit the owner's block without touching it —
#   the standard Pallas output-revisiting contract.
# ---------------------------------------------------------------------------


def _stage_starts(Ls):
    starts = [0]
    for length in Ls[:-1]:
        starts.append(starts[-1] + length)
    return starts


def _clamp_map3(start, Lc):
    return lambda i: (jnp.clip(i - start, 0, Lc - 1), 0, 0)


def _clamp_map4(start, Lc):
    return lambda i: (jnp.clip(i - start, 0, Lc - 1), 0, 0, 0)


def _rev_clamp_map3(start, Lc, Lt):
    return lambda i: (jnp.clip((Lt - 1 - i) - start, 0, Lc - 1), 0, 0)


def _rev_clamp_map4(start, Lc, Lt):
    return lambda i: (jnp.clip((Lt - 1 - i) - start, 0, Lc - 1), 0, 0, 0)


def _multi_fwd_kernel_s(*refs, causal: bool, pad: int, L0: int, Lr: int,
                        S: int, use_mask: bool, save: bool):
    x_ref = refs[0]
    wrefs = refs[1:1 + 4 * S]
    off = 1 + 4 * S
    if use_mask:
        mrefs = refs[off:off + S]
        off += S
    outs = refs[off:-2] if use_mask else refs[off:-1]
    if save:
        hs_ref, h_saved_ref, y_saved_ref = outs
    else:
        (hs_ref,) = outs
    if use_mask:
        hp_ref, mask_scr = refs[-2], refs[-1]
    else:
        hp_ref = refs[-1]

    T, C = x_ref.shape
    i = pl.program_id(0)
    st = _stage_of(i, L0, Lr)

    @pl.when(i == 0)
    def _():
        hp_ref[pl.ds(0, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad + T, pad)] = jnp.zeros((pad, C), jnp.float32)
        hp_ref[pl.ds(pad, T)] = x_ref[:]

    # active-stage weights: tiny arithmetic selects (S terms on <=48KB)
    w3 = b3 = w1 = b1 = None
    for s in range(S):
        sel = (st == s).astype(jnp.float32)
        w3s, b3s, w1s, b1s = (wrefs[4 * s + j][0] for j in range(4))
        w3 = w3s * sel if w3 is None else w3 + w3s * sel
        b3 = b3s * sel if b3 is None else b3 + b3s * sel
        w1 = w1s * sel if w1 is None else w1 + w1s * sel
        b1 = b1s * sel if b1 is None else b1 + b1s * sel
    if use_mask:
        # (T, C) u8 plane: guarded VMEM copy, not an S-term select
        for s in range(S):
            @pl.when(st == s)
            def _(s=s):
                mask_scr[:] = mrefs[s][0]

    h = hp_ref[pl.ds(pad, T)]
    if save:
        h_saved_ref[0] = h

    d = jnp.int32(1) << _local_of(i, L0, Lr)
    acc = b3
    for j, s in enumerate(_shifts(d, causal)):
        acc = acc + jax.lax.dot_general(
            hp_ref[pl.ds(pad - s, T)], w3[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    y = jnp.maximum(acc, 0.0)
    if save:
        y_saved_ref[0] = y
    z = jax.lax.dot_general(
        y, w1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + b1
    if use_mask:
        z = z * (mask_scr[:].astype(jnp.int32).astype(jnp.float32) * 2.0)
    hn = h + z
    hp_ref[pl.ds(pad, T)] = hn
    hs_ref[0] = hn


def _multi_fwd_call_s(x, ws, masks, *, causal: bool, L0: int, Lr: int,
                      save: bool, interpret: bool):
    S = len(ws)
    Ls = [w[0].shape[0] for w in ws]
    starts = _stage_starts(Ls)
    Lt = sum(Ls)
    C = ws[0][0].shape[2]
    T = x.shape[0]
    pad = 2 ** max(L0, Lr)

    in_arrays = [x]
    in_specs = [pl.BlockSpec((T, C), lambda i: (0, 0))]
    for s, (w3, b3, w1, b1) in enumerate(ws):
        Lc, st0 = Ls[s], starts[s]
        in_arrays += [w3, b3.reshape(Lc, 1, C), w1, b1.reshape(Lc, 1, C)]
        in_specs += [
            pl.BlockSpec((1, 3, C, C), _clamp_map4(st0, Lc)),
            pl.BlockSpec((1, 1, C), _clamp_map3(st0, Lc)),
            pl.BlockSpec((1, C, C), _clamp_map3(st0, Lc)),
            pl.BlockSpec((1, 1, C), _clamp_map3(st0, Lc)),
        ]
    if masks is not None:
        for s, mk in enumerate(masks):
            in_arrays.append(mk)
            in_specs.append(pl.BlockSpec((1, T, C), _clamp_map3(starts[s], Ls[s])))

    out_shape = [jax.ShapeDtypeStruct((S, T, C), jnp.float32)]
    out_specs = [pl.BlockSpec((1, T, C), lambda i: (_stage_of(i, L0, Lr), 0, 0))]
    if save:
        out_shape += [jax.ShapeDtypeStruct((Lt, T, C), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, T, C), lambda i: (i, 0, 0))] * 2

    scratch = [pltpu.VMEM((pad + T + pad, C), jnp.float32)]
    if masks is not None:
        scratch.append(pltpu.VMEM((T, C), jnp.uint8))

    out = pl.pallas_call(
        functools.partial(_multi_fwd_kernel_s, causal=causal, pad=pad, L0=L0,
                          Lr=Lr, S=S, use_mask=masks is not None, save=save),
        grid=(Lt,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*in_arrays)
    return out if save else out[0]


def _multi_bwd_kernel_s(*refs, causal: bool, pad: int, Lt: int, L0: int,
                        Lr: int, S: int, use_mask: bool):
    g_ref, h_ref, y_ref = refs[:3]
    wrefs = refs[3:3 + 2 * S]
    off = 3 + 2 * S
    if use_mask:
        mrefs = refs[off:off + S]
        off += S
    dx_ref = refs[off]
    drefs = refs[off + 1:off + 1 + 4 * S]
    if use_mask:
        dh_scr, hp_scr, ap_scr, mask_scr = refs[-4:]
    else:
        dh_scr, hp_scr, ap_scr = refs[-3:]

    T, C = dx_ref.shape
    i = pl.program_id(0)
    l = (Lt - 1) - i
    st = _stage_of(l, L0, Lr)
    local = _local_of(l, L0, Lr)
    d = jnp.int32(1) << local

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros((T, C), jnp.float32)
        zeros = jnp.zeros((pad, C), jnp.float32)
        hp_scr[pl.ds(0, pad)] = zeros
        hp_scr[pl.ds(pad + T, pad)] = zeros
        ap_scr[pl.ds(0, pad)] = zeros
        ap_scr[pl.ds(pad + T, pad)] = zeros

    w3 = w1 = None
    for s in range(S):
        sel = (st == s).astype(jnp.float32)
        w3s, w1s = wrefs[2 * s][0], wrefs[2 * s + 1][0]
        w3 = w3s * sel if w3 is None else w3 + w3s * sel
        w1 = w1s * sel if w1 is None else w1 + w1s * sel
    if use_mask:
        for s in range(S):
            @pl.when(st == s)
            def _(s=s):
                mask_scr[:] = mrefs[s][0]

    stage_len = jnp.where(l < L0, L0, Lr)
    dh_out = dh_scr[:]
    is_end = local == stage_len - 1
    dh_out = dh_out + jnp.where(is_end, 1.0, 0.0) * g_ref[0]

    h = h_ref[0]
    hp_scr[pl.ds(pad, T)] = h

    shifts = _shifts(d, causal)
    y = y_ref[0]

    dz = (
        dh_out * (mask_scr[:].astype(jnp.int32).astype(jnp.float32) * 2.0)
        if use_mask else dh_out
    )
    dw1_val = jax.lax.dot_general(
        y, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    db1_val = jnp.sum(dz, axis=0, keepdims=True)
    dy = jax.lax.dot_general(
        dz, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    da = jnp.where(y > 0.0, dy, 0.0)
    db3_val = jnp.sum(da, axis=0, keepdims=True)

    ap_scr[pl.ds(pad, T)] = da
    dhc = dh_out
    dw3_vals = []
    for j, s in enumerate(shifts):
        dw3_vals.append(jax.lax.dot_general(
            hp_scr[pl.ds(pad - s, T)], da,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ))
        dhc = dhc + jax.lax.dot_general(
            ap_scr[pl.ds(pad + s, T)], w3[j],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # guarded per-stage writes: only the owner cell touches its block
    for s in range(S):
        @pl.when(st == s)
        def _(s=s):
            dw3_r, db3_r, dw1_r, db1_r = drefs[4 * s:4 * s + 4]
            for j in range(3):
                dw3_r[0, j] = dw3_vals[j]
            db3_r[0] = db3_val
            dw1_r[0] = dw1_val
            db1_r[0] = db1_val
    dh_scr[:] = dhc
    dx_ref[:] = dhc


def _multi_bwd_call_s(g, h_saved, y_saved, ws, masks, *, causal: bool,
                      L0: int, Lr: int, interpret: bool):
    S = len(ws)
    Ls = [w[0].shape[0] for w in ws]
    starts = _stage_starts(Ls)
    Lt = sum(Ls)
    C = ws[0][0].shape[2]
    T = g.shape[1]
    pad = 2 ** max(L0, Lr)

    rev = lambda i: (Lt - 1 - i, 0, 0)  # noqa: E731
    g_map = lambda i: (_stage_of(Lt - 1 - i, L0, Lr), 0, 0)  # noqa: E731

    in_arrays = [g, h_saved, y_saved]
    in_specs = [
        pl.BlockSpec((1, T, C), g_map),
        pl.BlockSpec((1, T, C), rev),
        pl.BlockSpec((1, T, C), rev),
    ]
    for s, (w3, _, w1, _) in enumerate(ws):
        Lc, st0 = Ls[s], starts[s]
        in_arrays += [w3, w1]
        in_specs += [
            pl.BlockSpec((1, 3, C, C), _rev_clamp_map4(st0, Lc, Lt)),
            pl.BlockSpec((1, C, C), _rev_clamp_map3(st0, Lc, Lt)),
        ]
    if masks is not None:
        for s, mk in enumerate(masks):
            in_arrays.append(mk)
            in_specs.append(
                pl.BlockSpec((1, T, C), _rev_clamp_map3(starts[s], Ls[s], Lt)))

    out_shape = [jax.ShapeDtypeStruct((T, C), jnp.float32)]
    out_specs = [pl.BlockSpec((T, C), lambda i: (0, 0))]
    for s in range(S):
        Lc, st0 = Ls[s], starts[s]
        out_shape += [
            jax.ShapeDtypeStruct((Lc, 3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((Lc, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((Lc, C, C), jnp.float32),
            jax.ShapeDtypeStruct((Lc, 1, C), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, 3, C, C), _rev_clamp_map4(st0, Lc, Lt)),
            pl.BlockSpec((1, 1, C), _rev_clamp_map3(st0, Lc, Lt)),
            pl.BlockSpec((1, C, C), _rev_clamp_map3(st0, Lc, Lt)),
            pl.BlockSpec((1, 1, C), _rev_clamp_map3(st0, Lc, Lt)),
        ]

    scratch = [
        pltpu.VMEM((T, C), jnp.float32),
        pltpu.VMEM((pad + T + pad, C), jnp.float32),
        pltpu.VMEM((pad + T + pad, C), jnp.float32),
    ]
    if masks is not None:
        scratch.append(pltpu.VMEM((T, C), jnp.uint8))

    outs = pl.pallas_call(
        functools.partial(_multi_bwd_kernel_s, causal=causal, pad=pad, Lt=Lt,
                          L0=L0, Lr=Lr, S=S, use_mask=masks is not None),
        grid=(Lt,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*in_arrays)
    dx = outs[0]
    dws = tuple(
        (outs[1 + 4 * s], outs[2 + 4 * s].reshape(Ls[s], C),
         outs[3 + 4 * s], outs[4 + 4 * s].reshape(Ls[s], C))
        for s in range(S))
    return dx, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_multis_train(causal, interpret, L0, Lr, x, ws, masks):
    return _multi_fwd_call_s(x, ws, masks, causal=causal, L0=L0, Lr=Lr,
                             save=False, interpret=interpret)


def _fused_multis_train_fwd(causal, interpret, L0, Lr, x, ws, masks):
    hs, h_saved, y_saved = _multi_fwd_call_s(x, ws, masks, causal=causal,
                                             L0=L0, Lr=Lr, save=True,
                                             interpret=interpret)
    return hs, (h_saved, y_saved, ws, masks)


def _fused_multis_train_bwd(causal, interpret, L0, Lr, res, g):
    h_saved, y_saved, ws, masks = res
    dx, dws = _multi_bwd_call_s(g, h_saved, y_saved, ws, masks,
                                causal=causal, L0=L0, Lr=Lr,
                                interpret=interpret)
    dmasks = tuple(np.zeros(m.shape, dtype=jax.dtypes.float0) for m in masks)
    return dx, dws, dmasks


_fused_multis_train.defvjp(_fused_multis_train_fwd, _fused_multis_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_multis_eval(causal, interpret, L0, Lr, x, ws):
    return _multi_fwd_call_s(x, ws, None, causal=causal, L0=L0, Lr=Lr,
                             save=False, interpret=interpret)


def _fused_multis_eval_fwd(causal, interpret, L0, Lr, x, ws):
    hs, h_saved, y_saved = _multi_fwd_call_s(x, ws, None, causal=causal,
                                             L0=L0, Lr=Lr, save=True,
                                             interpret=interpret)
    return hs, (h_saved, y_saved, ws)


def _fused_multis_eval_bwd(causal, interpret, L0, Lr, res, g):
    h_saved, y_saved, ws = res
    dx, dws = _multi_bwd_call_s(g, h_saved, y_saved, ws, None, causal=causal,
                                L0=L0, Lr=Lr, interpret=interpret)
    return dx, dws


_fused_multis_eval.defvjp(_fused_multis_eval_fwd, _fused_multis_eval_bwd)


def dilated_residual_multistack_stages(x, stage_weights, L0: int, Lr: int, *,
                                       causal: bool = True, masks=None,
                                       interpret=None):
    """:func:`dilated_residual_multistack` with PER-STAGE operands: no
    host-side weight/mask concatenation, per-stage gradient outputs.

    ``stage_weights`` is a sequence of (w3 (L_s,3,C,C), b3 (L_s,C),
    w1 (L_s,C,C), b1 (L_s,C)); ``masks`` a matching sequence of
    (L_s, T, C) uint8 keep-masks, or None (eval)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)
    ws = tuple(tuple(w) for w in stage_weights)
    if masks is None:
        return _fused_multis_eval(causal, interpret, L0, Lr, x, ws)
    return _fused_multis_train(causal, interpret, L0, Lr, x, ws, tuple(masks))


# ---------------------------------------------------------------------------
# lax-level oracle (CPU fallback / tests)
# ---------------------------------------------------------------------------


def dilated_stack_xla(x, w3, b3, w1, b1, *, causal: bool = True, mask=None):
    """Reference semantics of the fused kernel, one layer at a time."""
    L = w3.shape[0]
    h = x.astype(jnp.float32)
    T = h.shape[0]
    for i in range(L):
        d = 2 ** i
        acc = b3[i][None, :]
        for j, s in enumerate(_shifts(d, causal)):
            if s >= 0:
                shifted = jnp.pad(h, ((s, 0), (0, 0)))[:T]
            else:
                shifted = jnp.pad(h, ((0, -s), (0, 0)))[-s:]
            acc = acc + shifted @ w3[i, j]
        y = jnp.maximum(acc, 0.0)
        z = y @ w1[i] + b1[i][None, :]
        if mask is not None:
            z = z * (mask[i].astype(jnp.float32) * 2.0)
        h = h + z
    return h
