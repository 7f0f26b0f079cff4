"""Sliding-window local attention.

COG and TransSVNet attend, for every frame ``t``, over the ``window`` most
recent frames (len_q=30). The reference materializes all T windows with a
Python loop (models_COG.py:147-176, models_TCN.py:370-380: frames before
``window-1`` are *zero-padded*, and the softmax runs over the full window
including the zero slots — there is no masking). Zero keys score exactly 0
and zero values contribute nothing to the numerator, so prepending
``window-1`` zero rows to K/V and taking a plain softmax reproduces the
reference bit-for-bit.

Two implementations with identical semantics:

- ``sliding_window_attention_xla`` — gather-based: builds (T, W, ...) key and
  value windows and lets XLA fuse the einsums. Simple, used as the CPU/test
  fallback and the correctness oracle.
- ``sliding_window_attention_pallas`` — a fused Pallas TPU kernel that tiles
  the time axis, keeps the K/V halo in VMEM, computes banded scores on the
  MXU, and never materializes the (T, W, D) window tensor in HBM.

Shapes (heads folded out by callers or kept, both supported):
    q:  (T, H, M, dk)   M query tokens per frame (COG: 15 text tokens;
                        TransSVNet encoder: the window itself)
    k:  (T, H, dk)      per-frame keys
    v:  (T, H, dv)      per-frame values
    out:(T, H, M, dv)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only namespace; present in all recent jax
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free layer norm over the last axis.

    The reference instantiates a *fresh* ``nn.LayerNorm`` inside every
    attention forward (models_TCN.py:232, :251; models_COG.py:47), so its
    affine parameters stay at identity and are never trained — functionally
    a plain normalization, reproduced here.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Scaled dot-product attention over the second-to-last axis of k/v.

    q (..., Lq, dk), k (..., Lk, dk), v (..., Lk, dv) -> (..., Lq, dv).
    Matches reference ScaledDotProductAttention (models_TCN.py:176-193),
    including the numpy-float scale factor.
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", q, k) / math.sqrt(d_k)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", attn, v)


def multi_head_attention(q, k, v):
    """Alias of :func:`attend` for (B, H, L, d) layouts."""
    return attend(q, k, v)


def sliding_windows(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(T, ...) -> (T, window, ...): window ending at t, zero-padded at left.

    Equivalent to the reference's per-frame window materialization loop
    (models_COG.py:157-165).
    """
    T = x.shape[0]
    pad = [(window - 1, 0)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad)
    idx = np.arange(T)[:, None] + np.arange(window)[None, :]
    return xp[jnp.asarray(idx)]


def sliding_window_attention_xla(q, k, v, window: int) -> jnp.ndarray:
    """Gather-based reference implementation (also the CPU fallback)."""
    kwin = sliding_windows(k, window)  # (T, W, H, dk); zero rows = zero keys
    vwin = sliding_windows(v, window)  # (T, W, H, dv)
    d_k = q.shape[-1]
    scores = jnp.einsum("thmd,twhd->thmw", q, kwin) / math.sqrt(d_k)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("thmw,twhd->thmd", attn, vwin)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _swa_kernel(q_ref, k_ref, v_ref, o_ref, *, window: int, tile: int):
    """One (head, time-tile) cell of the banded local attention.

    Block shapes (leading (1, 1) head/tile dims collapse on reshape):
      q_ref: (1, 1, tile, M, dk)            queries of the tile, one head
      k_ref: (1, 1, tile + window - 1, dk)  keys incl. left halo
      v_ref: (1, 1, tile + window - 1, dv)
      o_ref: (1, 1, tile, M, dv)

    Frame i of the tile attends to halo rows [i, i + window); banded masking
    keeps exactly those. The zero halo rows reproduce the reference's
    zero-key windows for the first frames of the sequence.
    """
    m = q_ref.shape[-2]
    dk = q_ref.shape[-1]
    dv = v_ref.shape[-1]
    halo = tile + window - 1

    q = q_ref[:].reshape(tile * m, dk)
    kk = k_ref[:].reshape(halo, dk)
    vv = v_ref[:].reshape(halo, dv)
    # (tile*M, halo) banded scores on the MXU.
    scores = jax.lax.dot_general(
        q, kk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)
    scores = scores.reshape(tile, m, halo)

    frame = jax.lax.broadcasted_iota(jnp.int32, (tile, m, halo), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, m, halo), 2)
    in_band = (col >= frame) & (col < frame + window)
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(in_band, scores, neg)

    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = jnp.where(in_band, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    attn = (p / denom).reshape(tile * m, halo)

    out = jax.lax.dot_general(
        attn, vv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def _halo_tiles(x: jnp.ndarray, tile: int, halo: int) -> jnp.ndarray:
    """(Tp + window - 1, ...) -> (n_tiles, halo, ...) overlapping tile views.

    One contiguous copy (≈(1 + window/tile)× the input) instead of the
    full (T, window, ...) window materialization (window× blowup).
    """
    n_tiles = (x.shape[0] - (halo - tile)) // tile
    idx = np.arange(n_tiles)[:, None] * tile + np.arange(halo)[None, :]
    return x[jnp.asarray(idx)]


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def sliding_window_attention_pallas(
    q, k, v, window: int, tile: int = 128, interpret: bool = False
):
    """Fused banded local attention. Same contract as the XLA version."""
    T, H, M, dk = q.shape
    dv = v.shape[-1]
    Tp = ((T + tile - 1) // tile) * tile
    halo = tile + window - 1

    # Left halo of zeros implements the reference's zero-key windows; right
    # pad rounds T up to the tile grid (padded frames are discarded).
    kp = jnp.pad(k, ((window - 1, Tp - T), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((window - 1, Tp - T), (0, 0), (0, 0)))
    qp = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))

    n_tiles = Tp // tile
    # Head-major, per-tile halo'd K/V so every grid cell reads one block.
    qp = qp.transpose(1, 0, 2, 3).reshape(H, n_tiles, tile, M, dk)
    kh = _halo_tiles(kp, tile, halo).transpose(2, 0, 1, 3)  # (H, n_tiles, halo, dk)
    vh = _halo_tiles(vp, tile, halo).transpose(2, 0, 1, 3)

    out = pl.pallas_call(
        functools.partial(_swa_kernel, window=window, tile=tile),
        out_shape=jax.ShapeDtypeStruct((H, n_tiles, tile, M, dv), q.dtype),
        grid=(H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile, M, dk), lambda h, t: (h, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, halo, dk), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, halo, dv), lambda h, t: (h, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, M, dv), lambda h, t: (h, t, 0, 0, 0)),
        interpret=interpret,
    )(qp, kh, vh)
    out = out.reshape(H, Tp, M, dv).transpose(1, 0, 2, 3)
    return out[:T]


# ---------------------------------------------------------------------------
# Pallas backward kernels
#
# Given g = dOut, with a = softmax(banded scores) recomputed in-kernel:
#   da = g·V_winᵀ,  ds = a ∘ (da − rowsum(da ∘ a)) / √dk
#   dQ_t = ds_t · K_win(t)                       (query-banded, like forward)
#   dK_j = Σ_{t: j ∈ win(t)} ds_t[·, j]ᵀ q_t     (key-banded, transposed)
#   dV_j = Σ_{t: j ∈ win(t)} a_t[·, j]ᵀ  g_t
# Both reductions become single MXU contractions over union-indexed banded
# score tensors, so the whole backward is fused with no (T, W, d) gathers.
# ---------------------------------------------------------------------------


def _banded_a_ds(q, kk, vv, g, window, tile, halo):
    """Shared backward prelude: banded a and ds over the union keys.

    q (tile*M, dk) queries; kk/vv (halo, d) union keys/values; g (tile*M, dv).
    Returns a, ds of shape (tile, M, halo).
    """
    m = g.shape[0] // tile
    dk = q.shape[-1]
    scores = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)
    scores = scores.reshape(tile, m, halo)
    frame = jax.lax.broadcasted_iota(jnp.int32, (tile, m, halo), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, m, halo), 2)
    in_band = (col >= frame) & (col < frame + window)
    neg = jnp.finfo(scores.dtype).min
    smax = jnp.max(jnp.where(in_band, scores, neg), axis=-1, keepdims=True)
    p = jnp.where(in_band, jnp.exp(scores - smax), 0.0)
    a = p / jnp.sum(p, axis=-1, keepdims=True)

    da = jax.lax.dot_general(
        g, vv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile, m, halo)
    da = jnp.where(in_band, da, 0.0)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True)) / math.sqrt(dk)
    return a, ds


def _swa_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, *, window, tile):
    m = q_ref.shape[-2]
    dk = q_ref.shape[-1]
    halo = tile + window - 1
    q = q_ref[:].reshape(tile * m, dk)
    kk = k_ref[:].reshape(halo, dk)
    vv = v_ref[:].reshape(halo, v_ref.shape[-1])
    g = g_ref[:].reshape(tile * m, v_ref.shape[-1])
    _, ds = _banded_a_ds(q, kk, vv, g, window, tile, halo)
    dq = jax.lax.dot_general(
        ds.reshape(tile * m, halo), kk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.reshape(dq_ref.shape).astype(dq_ref.dtype)


def _swa_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, dk_ref, dv_ref, *,
                        window, tile):
    """Key-tile gradients. Queries t ∈ [k0, k0+tile+window-1) contribute to
    keys [k0, k0+tile); the union key axis spans [k0-window+1,
    k0+tile+window-1) and outputs are its middle ``tile`` rows."""
    m = q_ref.shape[-2]
    dk_dim = q_ref.shape[-1]
    dv_dim = v_ref.shape[-1]
    qtile = tile + window - 1          # extended query block
    halo = qtile + window - 1          # union key axis
    q = q_ref[:].reshape(qtile * m, dk_dim)
    kk = k_ref[:].reshape(halo, dk_dim)
    vv = v_ref[:].reshape(halo, dv_dim)
    g = g_ref[:].reshape(qtile * m, dv_dim)
    a, ds = _banded_a_ds(q, kk, vv, g, window, qtile, halo)

    # dK_union = Σ_t ds[t]ᵀ q_t ; dV_union = Σ_t a[t]ᵀ g_t  (one contraction)
    dk_union = jax.lax.dot_general(
        ds.reshape(qtile * m, halo), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (halo, dk)
    dv_union = jax.lax.dot_general(
        a.reshape(qtile * m, halo), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (halo, dv)
    sl = slice(window - 1, window - 1 + tile)
    dk_ref[:] = dk_union[sl].reshape(dk_ref.shape).astype(dk_ref.dtype)
    dv_ref[:] = dv_union[sl].reshape(dv_ref.shape).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def sliding_window_attention_bwd_pallas(
    q, k, v, g, window: int, tile: int = 64, interpret: bool = False
):
    # tile=64 keeps the dkv kernel's banded intermediates
    # ((tile+2W-2, M, tile+3W-3) each) inside the 16 MB VMEM budget.
    """Fused backward: returns (dq, dk, dv). Same contracts as the forward."""
    T, H, M, dk_dim = q.shape
    dv_dim = v.shape[-1]
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile

    qp = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((window - 1, Tp - T), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((window - 1, Tp - T), (0, 0), (0, 0)))

    # ---- dQ: same tiling as the forward ----
    halo = tile + window - 1
    q_t = qp.transpose(1, 0, 2, 3).reshape(H, n_tiles, tile, M, dk_dim)
    g_t = gp.transpose(1, 0, 2, 3).reshape(H, n_tiles, tile, M, dv_dim)
    kh = _halo_tiles(kp, tile, halo).transpose(2, 0, 1, 3)
    vh = _halo_tiles(vp, tile, halo).transpose(2, 0, 1, 3)
    dq = pl.pallas_call(
        functools.partial(_swa_bwd_dq_kernel, window=window, tile=tile),
        out_shape=jax.ShapeDtypeStruct((H, n_tiles, tile, M, dk_dim), q.dtype),
        grid=(H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile, M, dk_dim), lambda h, t: (h, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, halo, dk_dim), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, halo, dv_dim), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, tile, M, dv_dim), lambda h, t: (h, t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, M, dk_dim), lambda h, t: (h, t, 0, 0, 0)),
        interpret=interpret,
    )(q_t, kh, vh, g_t)
    dq = dq.reshape(H, Tp, M, dk_dim).transpose(1, 0, 2, 3)[:T]

    # ---- dK/dV: key-tiled with extended query blocks ----
    qtile = tile + window - 1
    qhalo = qtile + window - 1
    # query blocks start at each key tile's origin, extended by window-1 to
    # the right; pad queries/g on the right to cover the last block
    qp2 = jnp.pad(qp, ((0, window - 1), (0, 0), (0, 0), (0, 0)))
    gp2 = jnp.pad(gp, ((0, window - 1), (0, 0), (0, 0), (0, 0)))
    q_blocks = _halo_tiles(qp2, tile, qtile).transpose(2, 0, 1, 3, 4)  # (H, nt, qtile, M, dk)
    g_blocks = _halo_tiles(gp2, tile, qtile).transpose(2, 0, 1, 3, 4)
    # union key/value buffers per key tile: [k0-window+1, k0+tile+window-1)
    kp2 = jnp.pad(kp, ((0, window - 1), (0, 0), (0, 0)))
    vp2 = jnp.pad(vp, ((0, window - 1), (0, 0), (0, 0)))
    kh2 = _halo_tiles(kp2, tile, qhalo).transpose(2, 0, 1, 3)
    vh2 = _halo_tiles(vp2, tile, qhalo).transpose(2, 0, 1, 3)

    dk_out, dv_out = pl.pallas_call(
        functools.partial(_swa_bwd_dkv_kernel, window=window, tile=tile),
        out_shape=(
            jax.ShapeDtypeStruct((H, n_tiles, tile, dk_dim), k.dtype),
            jax.ShapeDtypeStruct((H, n_tiles, tile, dv_dim), v.dtype),
        ),
        grid=(H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, qtile, M, dk_dim), lambda h, t: (h, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, qhalo, dk_dim), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, qhalo, dv_dim), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, qtile, M, dv_dim), lambda h, t: (h, t, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile, dk_dim), lambda h, t: (h, t, 0, 0)),
            pl.BlockSpec((1, 1, tile, dv_dim), lambda h, t: (h, t, 0, 0)),
        ),
        interpret=interpret,
    )(q_blocks, kh2, vh2, g_blocks)
    dk = dk_out.reshape(H, Tp, dk_dim).transpose(1, 0, 2)[:T]
    dv = dv_out.reshape(H, Tp, dv_dim).transpose(1, 0, 2)[:T]
    return dq, dk, dv


# Autodiff entry point: fused Pallas forward + fused Pallas backward.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _swa_pallas_ad(q, k, v, window: int, interpret: bool):
    return sliding_window_attention_pallas(q, k, v, window, interpret=interpret)


def _swa_pallas_fwd(q, k, v, window, interpret):
    return _swa_pallas_ad(q, k, v, window, interpret), (q, k, v)


def _swa_pallas_bwd(window, interpret, residuals, g):
    q, k, v = residuals
    return sliding_window_attention_bwd_pallas(q, k, v, g, window,
                                               interpret=interpret)


_swa_pallas_ad.defvjp(_swa_pallas_fwd, _swa_pallas_bwd)


def sliding_window_attention(q, k, v, window: int, use_pallas: bool = True):
    """Dispatch to the Pallas kernel on TPU (differentiable via the custom
    VJP above), XLA gather path elsewhere."""
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and on_tpu:
        return _swa_pallas_ad(q, k, v, window, False)
    return sliding_window_attention_xla(q, k, v, window)
