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

Shapes — HEAD-MAJOR, so the model's projections write the kernel's layout
directly (q/k/v head transposes of (T, ·, 8)-trailing tensors were the
dominant cost of the round-1 kernels' host glue):
    q:  (H, T, M, dk)   M query tokens per frame (COG: 15 text tokens)
    k:  (H, T, dk)      per-frame keys
    v:  (H, T, dv)      per-frame values
    out:(H, T, M, dv)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

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
    """Gather-based reference implementation (also the CPU fallback).

    q (H, T, M, dk), k (H, T, dk), v (H, T, dv) -> (H, T, M, dv).
    """
    kwin = jax.vmap(lambda x: sliding_windows(x, window))(k)  # (H, T, W, dk)
    vwin = jax.vmap(lambda x: sliding_windows(x, window))(v)
    d_k = q.shape[-1]
    scores = jnp.einsum("htmd,htwd->htmw", q, kwin) / math.sqrt(d_k)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("htmw,htwd->htmd", attn, vwin)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _band_softmax(scores, m, window):
    """Banded softmax numerator over a (rows, halo) score tile.

    Rows enumerate (frame, token) pairs of the tile (frame = row // m); row r
    attends halo columns [frame, frame + window). Returns the masked
    exponentials ``p`` and the band mask. 2D iota masking keeps the whole
    kernel in aligned (sublane, lane) layouts — no 3D reshapes/relayouts.
    """
    rows, halo = scores.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, halo), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, halo), 1)
    frame = row // m
    in_band = (col >= frame) & (col < frame + window)
    neg = jnp.finfo(scores.dtype).min
    smax = jnp.max(jnp.where(in_band, scores, neg), axis=-1, keepdims=True)
    p = jnp.where(in_band, jnp.exp(scores - smax), 0.0)
    return p, in_band


def _swa_kernel(q_ref, k_ref, v_ref, o_ref, *, window: int, tile: int, m: int):
    """One (head, time-tile) cell of the banded local attention.

    Block shapes:
      q_ref: (1, tile*M, dk)  queries of the tile, one head, token-flattened
      k_ref: (1, Tp + window - 1, dk)  the FULL padded key sequence — its
             index_map is constant in the tile axis, so Mosaic keeps it
             VMEM-resident across the tile sweep; the per-tile halo
             [t*tile, t*tile + tile + window - 1) is a dynamic-start slice
      v_ref: (1, Tp + window - 1, dv)  same for values
      o_ref: (1, tile*M, dv)

    The zero halo rows at the left edge reproduce the reference's zero-key
    windows for the first frames of the sequence.
    """
    i = pl.program_id(1)
    dk = q_ref.shape[-1]
    halo = tile + window - 1
    q = q_ref[0]                                   # (tile*m, dk)
    kk = k_ref[0, pl.ds(i * tile, halo), :]        # (halo, dk)
    vv = v_ref[0, pl.ds(i * tile, halo), :]        # (halo, dv)
    scores = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)                              # (tile*m, halo)
    p, _ = _band_softmax(scores, m, window)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn, vv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def sliding_window_attention_pallas(
    q, k, v, window: int, tile: int = 128, interpret: bool = False
):
    """Fused banded local attention. Same head-major contract as the XLA
    version; no transposes on the host graph — pads and free reshapes only."""
    H, T, M, dk = q.shape
    dv = v.shape[-1]
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile
    Tpw = Tp + window - 1

    # Left halo of zeros implements the reference's zero-key windows; right
    # pad rounds T up to the tile grid (padded frames are discarded).
    qh = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0))).reshape(H, Tp * M, dk)
    kh = jnp.pad(k, ((0, 0), (window - 1, Tp - T), (0, 0)))
    vh = jnp.pad(v, ((0, 0), (window - 1, Tp - T), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_swa_kernel, window=window, tile=tile, m=M),
        out_shape=jax.ShapeDtypeStruct((H, Tp * M, dv), q.dtype),
        grid=(H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile * M, dk), lambda h, t: (h, t, 0)),
            pl.BlockSpec((1, Tpw, dk), lambda h, t: (h, 0, 0)),
            pl.BlockSpec((1, Tpw, dv), lambda h, t: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile * M, dv), lambda h, t: (h, t, 0)),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(H, Tp, M, dv)[:, :T]


# ---------------------------------------------------------------------------
# Pallas backward: ONE merged kernel per (head, key-tile) producing dq, dk
# and dv together, so the banded softmax is recomputed once (round 1 ran two
# kernels — dq-tiled and dkv-tiled — and recomputed it twice).
#
# Given g = dOut, with a = softmax(banded scores) recomputed in-kernel:
#   da = g·V_winᵀ,  ds = a ∘ (da − rowsum(da ∘ a)) / √dk
#   dQ_t = ds_t · K_win(t)                       (query-banded)
#   dK_j = Σ_{t: j ∈ win(t)} ds_t[·, j]ᵀ q_t     (key-banded, transposed)
#   dV_j = Σ_{t: j ∈ win(t)} a_t[·, j]ᵀ  g_t
# For key tile [k0, k0+tile): the contributing queries are exactly
# [k0, k0+tile+W-1) (the extended query block), whose own key bands lie in
# the union axis [k0-W+1, k0+tile+W-1). dq for queries [k0, k0+tile) is a
# by-product of the same banded ds, so all three grads share one recompute.
# ---------------------------------------------------------------------------


def _swa_bwd_kernel(qa_ref, qb_ref, ga_ref, gb_ref, k_ref, v_ref,
                    dq_ref, dk_ref, dv_ref, *,
                    window: int, tile: int, m: int):
    """Merged backward for one (head, key-tile) cell.

    The extended query block [k0, k0+tile+W-1) is assembled in-kernel from
    two NATURAL query tiles — qa (tile t) and qb (tile t+1, index-map
    clamped at the last tile) — so the host graph carries no overlapping
    halo-stack copies of q/g. Rows whose global frame falls beyond the
    padded sequence (the clamped duplicate at the last tile) are masked out
    of a/ds before the contractions.

    qa_ref/qb_ref/ga_ref/gb_ref: (1, tile*M, d) natural query/grad tiles
    k_ref/v_ref: (1, Tp+2W-2, d) full padded sequences (VMEM-resident)
    dq_ref: (1, tile*M, dk) grads for queries [k0, k0+tile)
    dk_ref/dv_ref: (1, tile, d) grads for keys [k0, k0+tile)
    """
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    dk_d = qa_ref.shape[-1]
    qtile = tile + window - 1
    qhalo = qtile + window - 1              # union key axis
    ext = (window - 1) * m
    q = jnp.concatenate([qa_ref[0], qb_ref[0][:ext]], axis=0)  # (qtile*m, dk)
    g = jnp.concatenate([ga_ref[0], gb_ref[0][:ext]], axis=0)  # (qtile*m, dv)
    kk = k_ref[0, pl.ds(i * tile, qhalo), :]
    vv = v_ref[0, pl.ds(i * tile, qhalo), :]

    scores = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk_d)
    p, in_band = _band_softmax(scores, m, window)
    a = p / jnp.sum(p, axis=-1, keepdims=True)     # (qtile*m, qhalo)

    # zero the contributions of non-existent extension queries (last tile)
    row = jax.lax.broadcasted_iota(jnp.int32, (qtile * m, qhalo), 0)
    valid = (i * tile + row // m) < n_tiles * tile
    a = jnp.where(valid, a, 0.0)

    da = jax.lax.dot_general(
        g, vv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = jnp.where(in_band, da, 0.0)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True)) / math.sqrt(dk_d)

    dq = jax.lax.dot_general(
        ds, kk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (qtile*m, dk)
    dq_ref[0] = dq[: tile * m].astype(dq_ref.dtype)

    dk_union = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (qhalo, dk)
    dv_union = jax.lax.dot_general(
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] = dk_union[window - 1: window - 1 + tile].astype(dk_ref.dtype)
    dv_ref[0] = dv_union[window - 1: window - 1 + tile].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def sliding_window_attention_bwd_pallas(
    q, k, v, g, window: int, tile: int = 64, interpret: bool = False
):
    # tile=64 keeps the merged kernel's banded intermediates
    # ((tile+W-1)*M, tile+2W-2) inside the 16 MB VMEM budget.
    """Fused backward: returns (dq, dk, dv). Same head-major contracts as
    the forward; q/g ride in natural tiling (the kernel assembles extended
    query blocks from two adjacent tiles in VMEM)."""
    H, T, M, dk_dim = q.shape
    dv_dim = v.shape[-1]
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile
    last = n_tiles - 1

    qp = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0))).reshape(H, Tp * M, dk_dim)
    gp = jnp.pad(g, ((0, 0), (0, Tp - T), (0, 0), (0, 0))).reshape(H, Tp * M, dv_dim)

    # full key/value sequences, padded W-1 on both sides (union axis cover)
    Tkw = Tp + 2 * (window - 1)
    kf = jnp.pad(k, ((0, 0), (window - 1, Tp - T + window - 1), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (window - 1, Tp - T + window - 1), (0, 0)))

    dq, dk_out, dv_out = pl.pallas_call(
        functools.partial(_swa_bwd_kernel, window=window, tile=tile, m=M),
        out_shape=(
            jax.ShapeDtypeStruct((H, Tp * M, dk_dim), q.dtype),
            jax.ShapeDtypeStruct((H, Tp, dk_dim), k.dtype),
            jax.ShapeDtypeStruct((H, Tp, dv_dim), v.dtype),
        ),
        grid=(H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile * M, dk_dim), lambda h, t: (h, t, 0)),
            pl.BlockSpec((1, tile * M, dk_dim),
                         lambda h, t: (h, jnp.minimum(t + 1, last), 0)),
            pl.BlockSpec((1, tile * M, dv_dim), lambda h, t: (h, t, 0)),
            pl.BlockSpec((1, tile * M, dv_dim),
                         lambda h, t: (h, jnp.minimum(t + 1, last), 0)),
            pl.BlockSpec((1, Tkw, dk_dim), lambda h, t: (h, 0, 0)),
            pl.BlockSpec((1, Tkw, dv_dim), lambda h, t: (h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile * M, dk_dim), lambda h, t: (h, t, 0)),
            pl.BlockSpec((1, tile, dk_dim), lambda h, t: (h, t, 0)),
            pl.BlockSpec((1, tile, dv_dim), lambda h, t: (h, t, 0)),
        ),
        interpret=interpret,
    )(qp, qp, gp, gp, kf, vf)
    dq = dq.reshape(H, Tp, M, dk_dim)[:, :T]
    dk = dk_out[:, :T]
    dv = dv_out[:, :T]
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


# ---------------------------------------------------------------------------
# PACKED (fully transposed) layout: every HBM tensor keeps the big T*M axis
# on LANES and the tiny dk/dv axes on sublanes — minor-dim-8 buffers would
# otherwise be lane-padded 16x physically (measured: the layout copies and
# kernel DMA of the head-major path were ~1 ms of the COG step). The model's
# QKV einsums emit this layout directly ("nd,dhk->hkn"); scores live
# transposed (keys on sublanes) with softmax over the sublane axis, and the
# key halo is a 128-aligned 256-wide LANE slice whose surplus columns the
# band mask kills.
#   q: (H, dk, N)  N = T*M (queries flattened frame-major)
#   k: (H, dk, T)  v: (H, dv, T)   out: (H, dv, N)
# ---------------------------------------------------------------------------

def _key_halo(tile: int, window: int) -> int:
    """Key-halo lane-slice size, 128-aligned. The forward needs
    tile + window - 1 local keys per tile; the merged backward also re-serves
    the (window-1)*m extension queries of the next tile, whose last in-band
    key sits at local row tile - 1 + 2*(window-1). Deriving (rather than
    pinning 256) keeps windows > 65 correct with the default tile=128."""
    need = tile + 2 * (window - 1)
    return ((need + 127) // 128) * 128


def _band_t(rows, cols, m, window):
    """in_band[j, n]: key j (local halo row) serves query frame n//m."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    frame = col // m
    return (row >= frame) & (row < frame + window)


def _swa_packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *, window, tile,
                           m, kh):
    """One grid cell = one query tile, ALL heads (static in-kernel loop).

    Head-per-cell was 8x more grid cells; at these sizes each cell's
    matmuls are microseconds, so the per-cell fixed cost dominated the
    kernel time (round-3 measurement) — folding the head loop inside the
    cell amortizes it.

    VPU economy (the banded (kh, n) matrices dominate the kernel, not the
    MXU): q is pre-scaled by 1/sqrt(dk) — an (dk, n) pass instead of the
    (kh, n) score divide — and the softmax normalizer multiplies the (dv, n)
    OUTPUT rows rather than the (kh, n) probability matrix. Per-query
    softmax stats (row 0 = logsumexp, row 1 = 1/sum) are emitted for the
    merged backward, which then reconstructs probabilities as ONE
    ``exp(scores - lse)`` with no banded reductions or normalizer pass."""
    i = pl.program_id(0)
    H, dk, _ = q_ref.shape
    n = tile * m
    in_band = _band_t(kh, n, m, window)
    neg = -jnp.finfo(jnp.float32).max
    inv_sqrt = 1.0 / math.sqrt(dk)
    for h in range(H):
        q = q_ref[h] * inv_sqrt                    # (dk, tile*m)
        kk = k_ref[h, :, pl.ds(i * tile, kh)]       # (dk, kh)
        vv = v_ref[h, :, pl.ds(i * tile, kh)]       # (dv, kh)
        scores = jax.lax.dot_general(
            kk, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (kh, tile*m)
        # ONE band select: reusing the masked matrix for the exp makes the
        # out-of-band entries exp(-f32max - smax) = 0 exactly (underflow),
        # so no second where is needed
        ms = jnp.where(in_band, scores, neg)
        smax = jnp.max(ms, axis=0, keepdims=True)
        p = jnp.exp(ms - smax)
        psum = jnp.sum(p, axis=0, keepdims=True)
        rsum = 1.0 / psum
        out = jax.lax.dot_general(
            vv, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * rsum                                   # (dv, tile*m)
        o_ref[h] = out.astype(o_ref.dtype)
        lse = smax + jnp.log(psum)
        s_ref[h] = jnp.concatenate([lse, rsum], axis=0).astype(s_ref.dtype)


def _vma_of(*xs):
    """Union of the shard_map varying-manual-axes of the inputs (empty when
    not under shard_map). pallas_call outputs must declare their VMA when
    check_vma=True shard_map traces the kernel (the out ShapeDtypeStructs
    carry it)."""
    out = frozenset()
    for x in xs:
        try:
            out = out | jax.typeof(x).vma
        except Exception:
            pass
    return out


@functools.partial(jax.jit, static_argnames=("window", "m", "tile", "interpret",
                                             "return_stats"))
def sliding_window_attention_packed_fwd(q, k, v, window: int, m: int, tile: int = 128,
              interpret: bool = False, return_stats: bool = False):
    """q (H, dk, N) with N = T*M; k/v (H, d, T) -> out (H, dv, N).

    With ``return_stats`` also returns the per-query softmax stats
    (H, 2, N) — row 0 the banded logsumexp, row 1 the reciprocal sum —
    consumed by :func:`sliding_window_attention_packed_bwd`."""
    H, dk, N = q.shape
    dv = v.shape[1]
    T = N // m
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile
    halo = _key_halo(tile, window)
    Tk = Tp + halo  # left halo (window-1 zeros) + right safety padding

    qh = jnp.pad(q, ((0, 0), (0, 0), (0, (Tp - T) * m)))
    kh = jnp.pad(k, ((0, 0), (0, 0), (window - 1, Tk - T - (window - 1))))
    vh = jnp.pad(v, ((0, 0), (0, 0), (window - 1, Tk - T - (window - 1))))

    # At batch 1 the forward fits the 16M default scoped-vmem budget, but
    # under a trial vmap (engine trial_batch>1) Mosaic's packing runs ~5%
    # over (measured 16.88M at trial_batch=8, T=1024) — grant the same
    # explicit headroom the backward already uses (v5e: 128M physical).
    cparams = None
    if pltpu is not None and not interpret:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    vma = _vma_of(q, k, v)
    out, stats = pl.pallas_call(
        functools.partial(_swa_packed_fwd_kernel, window=window, tile=tile, m=m,
                          kh=halo),
        compiler_params=cparams,
        out_shape=(
            jax.ShapeDtypeStruct((H, dv, Tp * m), q.dtype, vma=vma),
            jax.ShapeDtypeStruct((H, 2, Tp * m), jnp.float32, vma=vma),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((H, dk, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, dk, Tk), lambda t: (0, 0, 0)),
            pl.BlockSpec((H, dv, Tk), lambda t: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((H, dv, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, 2, tile * m), lambda t: (0, 0, t)),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    if return_stats:
        return out[:, :, :N], stats[:, :, :N]
    return out[:, :, :N]


def _swa_packed_bwd_kernel(qa_ref, qb_ref, ga_ref, gb_ref, sa_ref, sb_ref,
                      k_ref, v_ref, dq_ref, dk_ref, dv_ref, *, window, tile,
                      m, kh, kh_chunk):
    """One grid cell = one key tile, ALL heads (see the forward kernel's
    note: per-cell fixed cost dominated the head-per-cell variant).

    The kernel is VPU-bound on the banded (kh, qn) matrices, so it leans on
    per-query stats (sa/sb: row 0 the forward's logsumexp, row 1 the
    host-side delta = out.g — the flash-attention identity
    sum_j a_jn da_jn = out_n.g_n) instead of recomputing any banded
    reduction: probabilities are ONE exp(scores - lse) (normalizer folded
    into the exponent), ds = a*(da - delta) with no (kh, qn) mul+rowsum,
    band and extension-validity fold into ONE select (``a`` being zero out
    of band makes a da-mask exactly redundant), and q is pre-scaled by
    1/sqrt(dk) so the score and dk matmuls need no banded rescale — only
    the tiny (dk, qn) dq rows are rescaled. (Folding the lse/delta
    subtracts into the matmuls as augmented [-1; stats] contraction rows
    was measured at parity — Mosaic already fuses the broadcasts into the
    exp/mul passes — and would push the stats through a bf16 matmul input;
    rejected.)

    ``kh_chunk`` splits the key halo into row chunks: the banded (kh, qn)
    intermediates partition EXACTLY by key rows (dq accumulates over
    chunks, the dk/dv output rows land in static per-chunk slices), so
    chunking caps the kernel's live VMEM at ~4 chunk-sized matrices with
    zero redundant compute. Used when (kh, qn) full-halo buffers would
    blow the ~16M scoped-VMEM stack (large m, e.g. TSVN's m = 30)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    H, dk_d, _ = qa_ref.shape
    n = tile * m
    ext = (window - 1) * m
    qn = n + ext
    inv_sqrt = 1.0 / math.sqrt(dk_d)
    nchunks = kh // kh_chunk
    # dk/dv output rows are the union's [window-1, window-1+tile) slice
    lo, hi = window - 1, window - 1 + tile
    for h in range(H):
        q = jnp.concatenate([qa_ref[h], qb_ref[h][:, :ext]],
                            axis=1) * inv_sqrt                    # (dk, qn)
        g = jnp.concatenate([ga_ref[h], gb_ref[h][:, :ext]], axis=1)  # (dv, qn)
        s = jnp.concatenate([sa_ref[h], sb_ref[h][:, :ext]], axis=1)  # (2, qn)
        dq_acc = None
        for c in range(nchunks):
            r0 = c * kh_chunk
            # band mask & validity of extension queries (clamped duplicate,
            # last tile) as one select; rows are chunk-local
            row = jax.lax.broadcasted_iota(jnp.int32, (kh_chunk, qn), 0) + r0
            col = jax.lax.broadcasted_iota(jnp.int32, (kh_chunk, qn), 1)
            frame = col // m
            mask = (row >= frame) & (row < frame + window) \
                & ((i * tile + frame) < n_tiles * tile)
            kk = k_ref[h, :, pl.ds(i * tile + r0, kh_chunk)]
            vv = v_ref[h, :, pl.ds(i * tile + r0, kh_chunk)]

            scores = jax.lax.dot_general(
                kk, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (kh_chunk, qn)
            a = jnp.where(mask, jnp.exp(scores - s[0:1]), 0.0)

            da = jax.lax.dot_general(
                vv, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (kh_chunk, qn)
            ds = a * (da - s[1:2])

            dq_c = jax.lax.dot_general(
                kk, ds, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (dk, qn)
            dq_acc = dq_c if dq_acc is None else dq_acc + dq_c

            # scores = kk^T (q/sqrt) -> d(scores)/dk is the pre-scaled q, so
            # contracting ds with the scaled q needs no further rescale
            dk_union = jax.lax.dot_general(
                ds, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (kh_chunk, dk)
            dv_union = jax.lax.dot_general(
                a, g, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (kh_chunk, dv)
            # intersect chunk rows [r0, r0+kh_chunk) with [lo, hi)
            a0, b0 = max(lo, r0), min(hi, r0 + kh_chunk)
            if a0 < b0:
                dk_ref[h, pl.ds(a0 - lo, b0 - a0)] = \
                    dk_union[a0 - r0:b0 - r0].astype(dk_ref.dtype)
                dv_ref[h, pl.ds(a0 - lo, b0 - a0)] = \
                    dv_union[a0 - r0:b0 - r0].astype(dv_ref.dtype)
        dq = dq_acc * inv_sqrt
        dq_ref[h] = dq[:, :n].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "m", "tile", "interpret"))
def sliding_window_attention_packed_bwd(q, k, v, g, out, stats, window: int,
              m: int, tile: int = 128, interpret: bool = False):
    """Merged backward in the transposed layout. ``out``/``stats`` are the
    forward's output and (H, 2, N) per-query softmax stats
    (``return_stats=True``); the softmax-VJP row sums are reconstructed via
    the flash-attention identity delta_n = out_n . g_n, so the kernel does
    no banded reduction at all. Returns (dq (H,dk,N),
    dk (H,Tp?,dk)->(H,T,dk), dv)."""
    H, dk_d, N = q.shape
    dv_d = v.shape[1]
    T = N // m
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile
    halo = _key_halo(tile, window)
    Tk = Tp + halo
    # ~4 banded (halo, qn) f32 matrices live at once; chunk the key rows
    # when they would blow the ~16M scoped-VMEM stack (see the kernel)
    qn = (tile + window - 1) * m
    kh_chunk = halo if 4 * halo * qn * 4 <= 11e6 else 128

    delta = jnp.einsum("hdn,hdn->hn", out, g)
    sd = jnp.stack([stats[:, 0], delta], axis=1)   # (H, 2, N): lse, delta

    qh = jnp.pad(q, ((0, 0), (0, 0), (0, (Tp - T) * m)))
    gh = jnp.pad(g, ((0, 0), (0, 0), (0, (Tp - T) * m)))
    sh = jnp.pad(sd, ((0, 0), (0, 0), (0, (Tp - T) * m)))
    kh = jnp.pad(k, ((0, 0), (0, 0), (window - 1, Tk - T - (window - 1))))
    vh = jnp.pad(v, ((0, 0), (0, 0), (window - 1, Tk - T - (window - 1))))
    last = n_tiles - 1

    # the chunked body still carries ~1.05x the 16M default scoped-vmem
    # budget in mask/int temporaries at m=30; the v5e has 128M physical
    # VMEM, so grant the kernel headroom explicitly (TPU lowering only —
    # interpret mode ignores compiler params)
    # 96M (v5e: 128M physical): the chunked body needs ~1.05x the 16M
    # default at m=30, and a trial-vmapped backward measured 64.25M at
    # trial_batch=8, T=1024 — Mosaic's batched packing adds a small
    # overhead on top of the per-cell blocks.
    cparams = None
    if pltpu is not None and not interpret:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    vma = _vma_of(q, k, v, g, out, stats)
    dq, dk_out, dv_out = pl.pallas_call(
        functools.partial(_swa_packed_bwd_kernel, window=window, tile=tile, m=m,
                          kh=halo, kh_chunk=kh_chunk),
        compiler_params=cparams,
        out_shape=(
            jax.ShapeDtypeStruct((H, dk_d, Tp * m), q.dtype, vma=vma),
            jax.ShapeDtypeStruct((H, Tp, dk_d), k.dtype, vma=vma),
            jax.ShapeDtypeStruct((H, Tp, dv_d), v.dtype, vma=vma),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((H, dk_d, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, dk_d, tile * m),
                         lambda t: (0, 0, jnp.minimum(t + 1, last))),
            pl.BlockSpec((H, dv_d, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, dv_d, tile * m),
                         lambda t: (0, 0, jnp.minimum(t + 1, last))),
            pl.BlockSpec((H, 2, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, 2, tile * m),
                         lambda t: (0, 0, jnp.minimum(t + 1, last))),
            pl.BlockSpec((H, dk_d, Tk), lambda t: (0, 0, 0)),
            pl.BlockSpec((H, dv_d, Tk), lambda t: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((H, dk_d, tile * m), lambda t: (0, 0, t)),
            pl.BlockSpec((H, tile, dk_d), lambda t: (0, t, 0)),
            pl.BlockSpec((H, tile, dv_d), lambda t: (0, t, 0)),
        ),
        interpret=interpret,
    )(qh, qh, gh, gh, sh, sh, kh, vh)
    return dq[:, :, :N], dk_out[:, :T], dv_out[:, :T]




# vmap support: jax's generic pallas batching inserts the mapped axis as a
# squeezed interior block dim, which the TPU lowering rejects (last-two-dims
# tiling). The kernels are head-parallel, so batching folds EXACTLY into the
# leading head/grid axis instead: (B, H, d, N) -> (B*H, d, N).
@functools.lru_cache(maxsize=None)
def _packed_fwd_batched(window: int, m: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(q, k, v):
        return sliding_window_attention_packed_fwd(q, k, v, window, m,
                                                   interpret=interpret,
                                                   return_stats=True)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, k, v):  # noqa: ANN001
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        q, k, v = (bc(x, b) for x, b in zip((q, k, v), in_batched))
        B, H = q.shape[:2]
        out, stats = f(q.reshape((B * H,) + q.shape[2:]),
                       k.reshape((B * H,) + k.shape[2:]),
                       v.reshape((B * H,) + v.shape[2:]))
        return (out.reshape((B, H) + out.shape[1:]),
                stats.reshape((B, H) + stats.shape[1:])), (True, True)

    return f


@functools.lru_cache(maxsize=None)
def _packed_bwd_batched(window: int, m: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(q, k, v, g, out, stats):
        return sliding_window_attention_packed_bwd(q, k, v, g, out, stats,
                                                   window, m,
                                                   interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, k, v, g, out, stats):  # noqa: ANN001
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        q, k, v, g, out, stats = (
            bc(x, b) for x, b in zip((q, k, v, g, out, stats), in_batched))
        B, H = q.shape[:2]
        outs = f(q.reshape((B * H,) + q.shape[2:]),
                 k.reshape((B * H,) + k.shape[2:]),
                 v.reshape((B * H,) + v.shape[2:]),
                 g.reshape((B * H,) + g.shape[2:]),
                 out.reshape((B * H,) + out.shape[2:]),
                 stats.reshape((B * H,) + stats.shape[2:]))
        return (tuple(o.reshape((B, H) + o.shape[1:]) for o in outs),
                (True, True, True))

    return f


# Autodiff entry point for the packed layout.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _swa_packed_ad(q, k, v, window: int, m: int, interpret: bool):
    return _packed_fwd_batched(window, m, interpret)(q, k, v)[0]


def _swa_packed_fwd_rule(q, k, v, window, m, interpret):
    out, stats = _packed_fwd_batched(window, m, interpret)(q, k, v)
    return out, (q, k, v, out, stats)


def _swa_packed_bwd_rule(window, m, interpret, residuals, g):
    q, k, v, out, stats = residuals
    dq, dk, dv = _packed_bwd_batched(window, m, interpret)(q, k, v, g, out,
                                                           stats)
    # dk/dv come back (H, T, d); the packed contract is (H, d, T)
    return dq, dk.transpose(0, 2, 1), dv.transpose(0, 2, 1)


_swa_packed_ad.defvjp(_swa_packed_fwd_rule, _swa_packed_bwd_rule)


def sliding_window_attention_packed(q, k, v, window: int, m: int,
                                    use_pallas: bool = True,
                                    interpret: Optional[bool] = None):
    """Packed-layout dispatch: Pallas on TPU (differentiable via the custom
    VJP), otherwise converts to head-major and uses the XLA gather path.
    ``interpret=True`` forces the Pallas path in interpret mode off-TPU —
    used to pin the kernel's shard_map composition on the CPU mesh
    (tests/test_sp_cog.py)."""
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and (on_tpu or interpret):
        # under shard_map the inputs may carry DIFFERENT varying-manual-axes
        # (SP COG layer 0: the text queries are built from replicated
        # constants while k/v are T-sharded). XLA ops lift mixed operands
        # with an implicit pvary whose TRANSPOSE is the psum that proves the
        # upstream param grads replicated; pallas_call does no such lifting,
        # so do it explicitly or grad inference fails (tpu_sp_smoke.py).
        vma = _vma_of(q, k, v)

        def lift(x):
            missing = tuple(vma - _vma_of(x))
            if not missing:
                return x
            return jax.lax.pcast(x, missing, to="varying")

        return _swa_packed_ad(lift(q), lift(k), lift(v), window, m,
                              bool(interpret) and not on_tpu)
    H, dk, N = q.shape
    q4 = q.transpose(0, 2, 1).reshape(H, N // m, m, dk)
    out = sliding_window_attention_xla(
        q4, k.transpose(0, 2, 1), v.transpose(0, 2, 1), window)
    return out.reshape(H, N, -1).transpose(0, 2, 1)
