"""Sequence-parallel COG: the flagship frame model trained on ONE trial
whose time axis is sharded over the mesh (see :mod:`.seqpar` for the SP
design rules; reference ``MED/modeling/models_COG.py:262-524``).

Everything in COG is frame-local except three things, each handled with a
single cheap ICI exchange:

1. the chain-of-gesture encoder's sliding window (len_q=30 frames): the
   K/V sequence needs the last ``len_q - 1`` *normed* visual rows of the
   left neighbor (:func:`halo_left`); at the global left edge the rows are
   the reference's zero-pad windows, which the learned ``enc_norm`` maps to
   its bias β — so the edge halo is β rows, not zeros;
2. the causal dilated conv taps of the TCN stacks
   (:func:`..seqpar.seq_shift_right`);
3. the masked means of the CE + truncated-MSE smoothing loss (one psum
   pair per reduction; the smoothing pair (t-1, t) needs a 1-frame shift).

The fast path's 16x average pool, the nearest-resampled track labels
(stride-16 reads) and the FPN (equal-length tracks: upsample-add is
identity-add) are shard-local as long as the local shard length is a
multiple of ``fast_pool`` — enforced below.

Functions consume the stock ``COG`` param/constant trees (models/cog.py),
so checkpoints and importers are shared with the single-chip path.
Restrictions vs the single-chip model (documented, asserted):
``true_len == T`` (SP exists to avoid padding — pad to a multiple of
``32 * n_shards`` at data prep instead), ``srm/skill`` variants via the
same entry points (the second chain is just another transformer call),
``hier`` no-op quirk preserved (all slow tracks full resolution).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import sliding_window_attention_packed
from .seqpar import seq_shift_right


# ---------------------------------------------------------------------------
# halo exchange
# ---------------------------------------------------------------------------


def halo_left(x: jnp.ndarray, width: int, axis_name: str,
              fill_row: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(T_local, d) block -> (width, d): the last ``width`` global rows
    BEFORE this shard. Rows left of the global edge receive ``fill_row``
    broadcast (or zeros).

    The common case (width <= T_local) is ONE ppermute of the local tail.
    A wider halo — many shards over a short trial — spans K = ceil(width /
    T_local) left neighbors: K full-block ppermute hops, concatenated and
    sliced (out-of-range shards contribute ppermute's implicit zeros, then
    the per-row edge fill overwrites the rows left of global zero)."""
    n = lax.axis_size(axis_name)
    S = x.shape[0]
    if width <= S:
        tail = x[-width:]
        if n > 1:
            h = lax.ppermute(tail, axis_name,
                             [(i, i + 1) for i in range(n - 1)])
        else:
            h = jnp.zeros_like(tail)
        if fill_row is not None:
            edge = jnp.broadcast_to(fill_row, h.shape)
            h = jnp.where(lax.axis_index(axis_name) == 0, edge, h)
        return h

    # multi-hop: blocks from shards i-K .. i-1 cover [i*S - K*S, i*S)
    K = -(-width // S)
    blocks = []
    for hop in range(K, 0, -1):
        if hop >= n:
            blocks.append(jnp.zeros_like(x))
            continue
        perm = [(i, i + hop) for i in range(n - hop)]
        blocks.append(lax.ppermute(x, axis_name, perm))
    h = jnp.concatenate(blocks, axis=0)[K * S - width:]
    # rows before global position 0: row r of the halo is global row
    # i*S - width + r, invalid while r < width - i*S
    invalid = (jnp.arange(width) <
               width - lax.axis_index(axis_name) * S)[:, None]
    edge = (jnp.broadcast_to(fill_row, h.shape) if fill_row is not None
            else jnp.zeros_like(h))
    return jnp.where(invalid, edge, h)


# ---------------------------------------------------------------------------
# chain-of-gesture transformer (models/cog.py::ChainOfGestureTransformer)
# ---------------------------------------------------------------------------


def _ln0(x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _ln_d(p, x):
    """_LayerNormD: learned LN over axis 0 of (d, N)."""
    shape = (-1,) + (1,) * (x.ndim - 1)
    return _ln0(x) * p["scale"].reshape(shape) + p["bias"].reshape(shape)


def _packed_q(kernel, x, n_heads):
    d = kernel.shape[0]
    return jnp.einsum("dn,dhk->hkn", x,
                      kernel.reshape(d, n_heads, -1))


def _packed_kv(kernel, x, n_heads):
    d = kernel.shape[0]
    return jnp.einsum("nd,dhk->hkn", x,
                      kernel.reshape(d, n_heads, -1))


def _encoder_layer(p, text, visual_seq, *, window, m, n_heads, use_pallas,
                   interpret=None):
    """COGEncoderLayer on a local block: text (d, T_local*M) feature-major,
    visual_seq (T_local + window - 1, d) halo-prepended."""
    q_in = _ln_d(p["norm1"], text)
    q = _packed_q(p["W_Q"]["kernel"], q_in, n_heads)
    k = _packed_kv(p["W_K"]["kernel"], visual_seq, n_heads)
    v = _packed_kv(p["W_V"]["kernel"], visual_seq, n_heads)
    T = visual_seq.shape[0] - (window - 1)
    pad = window - 1
    q = jnp.pad(q, ((0, 0), (0, 0), (pad * m, 0)))
    ctx = sliding_window_attention_packed(
        q, k, v, window, m, use_pallas, interpret=interpret)[:, :, pad * m:]
    ctx = ctx.reshape(q_in.shape[0], T * m)
    out = _ln0(ctx + q_in)          # unlearned LN (models_COG.py:47)
    out = _ln_d(p["norm3"], out)
    w1 = p["ffn"]["Dense_0"]["kernel"]
    w2 = p["ffn"]["Dense_1"]["kernel"]
    y = jax.nn.relu(jnp.einsum("df,dn->fn", w1, out))
    y = jnp.einsum("fd,fn->dn", w2, y)
    return _ln0(y + out)


def sp_cog_transformer(p, gest_embed, x, *, len_q: int, n_heads: int = 8,
                       n_layers: int = 2, axis_name: str = "data",
                       use_pallas: bool = False, interpret=None):
    """ChainOfGestureTransformer on a T-sharded (T_local, f_dim) block ->
    (T_local, M*d_model). One halo exchange of ``len_q - 1`` normed visual
    rows replaces the single-chip left zero-pad (edge shards receive the
    learned enc_norm bias β = norm(0), exactly the reference's padded
    windows)."""
    visual = x @ p["linear1"]["kernel"]
    text0 = gest_embed @ p["linear2"]["kernel"]
    d_model = text0.shape[-1]
    # nn.LayerNorm(name='enc_norm'), eps 1e-6: pad rows norm(0) = bias
    mu = jnp.mean(visual, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(visual - mu), axis=-1, keepdims=True)
    normed = ((visual - mu) * lax.rsqrt(var + 1e-6)
              * p["enc_norm"]["scale"] + p["enc_norm"]["bias"])
    halo = halo_left(normed, len_q - 1, axis_name,
                     fill_row=p["enc_norm"]["bias"])
    visual_seq = jnp.concatenate([halo, normed], axis=0)

    T = x.shape[0]
    M = text0.shape[0]
    text = jnp.tile(text0.T, (1, T))
    for i in range(n_layers):
        text = _encoder_layer(
            p[f"layer{i}"], text, visual_seq, window=len_q, m=M,
            n_heads=n_heads, use_pallas=use_pallas, interpret=interpret)

    # final single-head attention over the M text tokens (frame-local)
    pa = p["atten"]
    qp = jnp.einsum("dn,de->en", text, pa["W_Q"]["kernel"])
    k0 = text0 @ pa["W_K"]["kernel"]
    v0 = text0 @ pa["W_V"]["kernel"]
    scores = jnp.einsum("en,je->jn", qp, k0) / math.sqrt(d_model)
    attn = jax.nn.softmax(scores, axis=0)
    ctx = jnp.einsum("jn,je->en", attn, v0)
    out = _ln0(ctx + text)
    return out.T.reshape(T, M * d_model)


# ---------------------------------------------------------------------------
# TCN stages + forward
# ---------------------------------------------------------------------------


def _conv1x1(x, conv_params):
    p = conv_params["Conv_0"]
    return x @ p["kernel"][0] + p["bias"]


def _sp_stage(p, x, *, axis_name, use_input_conv=True, ch_keep=None,
              mask=None):
    """COGStage (models/cog.py::COGStage) on a local (T_local, C) block:
    optional 1x1 input conv + channel dropout, SP residual stack, 1x1
    class conv. ``ch_keep``: (C,) channel keep-mask, IDENTICAL on every
    shard (channel dropout is T-invariant)."""
    from .seqpar import sp_residual_stack

    h = _conv1x1(x, p["conv_in"]) if use_input_conv else x
    if ch_keep is not None:
        h = h * ch_keep.astype(h.dtype) * 2.0
    st = p["stack"]
    h = sp_residual_stack(h, st["w3"], st["b3"], st["w1"], st["b1"],
                          axis_name=axis_name, mask=mask)
    logits = _conv1x1(h, p["conv_out"])
    return h, logits.astype(jnp.float32)


def sp_cog_forward(params, constants, x, *, num_r: int = 3,
                   fast_pool: int = 16, len_q: int = 30,
                   axis_name: str = "data", use_pallas: bool = False,
                   interpret=None, dropout=None):
    """COG forward (models/cog.py::COG.__call__; reference
    models_COG.py:482-524) on a T-sharded (T_local, f_dim) block.

    Returns out_list of LOCAL track blocks: (1 + num_r) slow FPN tracks
    (T_local, C) + (1 + num_r) fast tracks (T_local//fast_pool, C).
    ``dropout``: None
    (eval) or a dict {'ch_TCN','ch_fast': (C,) keeps; 'TCN','R{r}',
    'fast_stage1','fast_R{r}': (L, T_local_track, C) stack keep-masks}.
    """
    T = x.shape[0]
    if T % fast_pool:
        raise ValueError(f"local shard length {T} must be a multiple of "
                         f"fast_pool={fast_pool}")
    dp = dropout or {}
    xx = sp_cog_transformer(
        params["cot"], constants["gest_embed"], x, len_q=len_q,
        axis_name=axis_name, use_pallas=use_pallas, interpret=interpret)

    # slow path: Basic stage + num_r refinement stages on features
    f, _ = _sp_stage(params["TCN"], xx, axis_name=axis_name,
                     ch_keep=dp.get("ch_TCN"), mask=dp.get("TCN"))
    f_list = [f]
    for r in range(num_r):
        f, _ = _sp_stage(params[f"R{r}"], f, axis_name=axis_name,
                         use_input_conv=False, mask=dp.get(f"R{r}"))
        f_list.append(f)

    # FPN: all slow tracks are full resolution (hier no-op quirk), so the
    # linear upsample is the identity and upsample-add is local
    lat = params["latlayer1"]
    p_top = f_list[-1]
    pyramid = [p_top]
    for c in reversed(f_list[:-1]):
        p_top = p_top + _conv1x1(c, lat)
        pyramid.insert(0, p_top)
    out_list = [_conv1x1(p, params["conv_out"]).astype(jnp.float32)
                for p in pyramid]

    # fast path: 16x average pool is shard-local (T_local % fast_pool == 0)
    C = xx.shape[-1]
    fast = jnp.mean(xx.reshape(T // fast_pool, fast_pool, C), axis=1)
    fast_f, fast_out = _sp_stage(
        params["fast_stage1"], fast, axis_name=axis_name,
        ch_keep=dp.get("ch_fast"), mask=dp.get("fast_stage1"))
    out_list.append(fast_out)
    for r in range(num_r):
        fast_f, fast_out = _sp_stage(
            params[f"fast_R{r}"], jax.nn.softmax(fast_out, axis=-1),
            axis_name=axis_name, mask=dp.get(f"fast_R{r}"))
        out_list.append(fast_out)
    return out_list


# ---------------------------------------------------------------------------
# loss (engine.py::_loss_for_family 'cog' at error_type='global',
# true_len == T; losses.py::cog_track_loss + smooth_loss)
# ---------------------------------------------------------------------------


def _track_ce_sm(logits, labels_local, *, axis_name):
    """One track's (CE, smoothing) over GLOBAL length: local sums + psums.

    ``labels_local`` are already the nearest-resampled labels for this
    track's local rows (full track: identity; fast track: stride-16 reads —
    both shard-local at true_len == T)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(
        logp, labels_local.astype(jnp.int32)[:, None], axis=-1)[:, 0]
    t_local = logits.shape[0]
    ce = (lax.psum(jnp.sum(per), axis_name)
          / lax.psum(jnp.asarray(t_local, per.dtype), axis_name))

    # truncated-MSE smoothing: pairs (t-1, t); prev frame detached; the
    # global t=0 pair is invalid (single-chip smooth_loss starts at t=1)
    prev = seq_shift_right(lax.stop_gradient(logp), 1, axis_name)
    sq = jnp.clip(jnp.square(logp - prev), 0.0, 16.0)
    valid = jnp.ones((t_local,), logp.dtype)
    valid = valid.at[0].set(
        jnp.where(lax.axis_index(axis_name) == 0, 0.0, 1.0))
    num = lax.psum(jnp.sum(jnp.mean(sq, axis=-1) * valid), axis_name)
    den = lax.psum(jnp.sum(valid), axis_name)
    return ce, num / jnp.maximum(den, 1e-12)


def sp_cog_loss(params, constants, x, labels, *, num_r: int = 3,
                fast_pool: int = 16, len_q: int = 30, smooth_lambda: float = 0.15,
                axis_name: str = "data", use_pallas: bool = False,
                interpret=None, dropout=None):
    """Track-averaged CE + λ·smoothing over all 2·(1+num_r) tracks
    (engine.py _loss_for_family 'cog'); labels (T_local,) sharded like x."""
    out_list = sp_cog_forward(
        params, constants, x, num_r=num_r, fast_pool=fast_pool, len_q=len_q,
        axis_name=axis_name, use_pallas=use_pallas, interpret=interpret,
        dropout=dropout)
    ce_total, sm_total = 0.0, 0.0
    fast_labels = labels[::fast_pool]
    for track in out_list:
        lbl = labels if track.shape[0] == labels.shape[0] else fast_labels
        ce, sm = _track_ce_sm(track, lbl, axis_name=axis_name)
        ce_total += ce
        sm_total += sm
    n = len(out_list)
    return ce_total / n + smooth_lambda * (sm_total / n)


def _track_ce_sm_masked(logits, labels_local, mask_local, *, axis_name,
                        class_weights=None):
    """One track's (CE, smoothing) with an arbitrary per-position mask over
    GLOBAL track length — the general form of engine losses
    (losses.py::cog_track_loss / cross_entropy / smooth_loss) under SP:

    - CE: sum(per·w)/sum(w) with w = mask (or class_weights[label]·mask),
      psum pair;
    - truncated-MSE smoothing over pairs (t-1, t) with pair mask
      m_t · m_{t-1}; the shifted mask arrives by the same distributed shift
      as the detached previous frame, so the global t=0 pair is excluded
      automatically (the shift fills zeros)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(
        logp, labels_local.astype(jnp.int32)[:, None], axis=-1)[:, 0]
    m = mask_local.astype(logp.dtype)
    w = m if class_weights is None else (
        jnp.asarray(class_weights)[labels_local.astype(jnp.int32)] * m)
    ce = (lax.psum(jnp.sum(per * w), axis_name)
          / jnp.maximum(lax.psum(jnp.sum(w), axis_name), 1e-12))

    prev = seq_shift_right(lax.stop_gradient(logp), 1, axis_name)
    m_prev = seq_shift_right(m, 1, axis_name)
    pairm = m * m_prev
    sq = jnp.clip(jnp.square(logp - prev), 0.0, 16.0)
    num = lax.psum(jnp.sum(jnp.mean(sq, axis=-1) * pairm), axis_name)
    den = lax.psum(jnp.sum(pairm), axis_name)
    return ce, num / jnp.maximum(den, 1e-12)


def sp_cog_loss_masked(params, constants, x, track_labels_full,
                       track_mask_full, track_labels_fast, track_mask_fast,
                       *, num_r: int = 3, fast_pool: int = 16,
                       len_q: int = 30, smooth_lambda: float = 0.15,
                       class_weights=None, axis_name: str = "data",
                       use_pallas: bool = False, interpret=None,
                       dropout=None):
    """The engine's full COG objective (engine.py::_loss_for_family 'cog' +
    _cog_sequential_loss) under SP, with padded trials / true_len < T and
    every label regime.

    The per-track resampled labels and validity/gate masks are data — fixed
    per trial — so they are prepared ONCE outside the step
    (sp_train.py::_track_targets replicates losses.nearest_resample_dynamic
    + the true_out valid window + the sequential gate resample exactly) and
    arrive here as T-sharded blocks: all (1 + num_r) slow tracks share
    (track_labels_full, track_mask_full), all fast tracks the _fast pair.
    Returns (loss, out_list)."""
    out_list = sp_cog_forward(
        params, constants, x, num_r=num_r, fast_pool=fast_pool, len_q=len_q,
        axis_name=axis_name, use_pallas=use_pallas, interpret=interpret,
        dropout=dropout)
    ce_total, sm_total = 0.0, 0.0
    for track in out_list:
        full = track.shape[0] == track_labels_full.shape[0]
        lbl = track_labels_full if full else track_labels_fast
        msk = track_mask_full if full else track_mask_fast
        ce, sm = _track_ce_sm_masked(track, lbl, msk, axis_name=axis_name,
                                     class_weights=class_weights)
        ce_total += ce
        sm_total += sm
    n = len(out_list)
    loss = ce_total / n + smooth_lambda * (sm_total / n)
    return loss, out_list


# ---------------------------------------------------------------------------
# dropout mask generation + train step
# ---------------------------------------------------------------------------


def sp_cog_dropout(key, *, T: int, channels: int, num_layers_basic: int,
                   num_layers_r: int, num_r: int, fast_pool: int = 16):
    """Global COG dropout draws: channel keeps (identical on every shard)
    + bit-packed stack keep-masks per stage (seqpar.sp_dropout_masks
    scheme). Returns a dict matching sp_cog_forward's ``dropout`` arg with
    GLOBAL (L, T_track, C) masks — shard along axis 1 before use."""
    from .seqpar import sp_dropout_masks

    keys = jax.random.split(key, 4 + 2 * num_r)
    dp = {
        "ch_TCN": jax.random.bernoulli(keys[0], 0.5, (channels,)),
        "ch_fast": jax.random.bernoulli(keys[1], 0.5, (channels,)),
        "TCN": sp_dropout_masks(keys[2], num_stages=1,
                                num_layers=num_layers_basic, T=T,
                                channels=channels)[0],
        "fast_stage1": sp_dropout_masks(keys[3], num_stages=1,
                                        num_layers=num_layers_basic,
                                        T=T // fast_pool,
                                        channels=channels)[0],
    }
    for r in range(num_r):
        dp[f"R{r}"] = sp_dropout_masks(
            keys[4 + 2 * r], num_stages=1, num_layers=num_layers_r, T=T,
            channels=channels)[0]
        dp[f"fast_R{r}"] = sp_dropout_masks(
            keys[5 + 2 * r], num_stages=1, num_layers=num_layers_r,
            T=T // fast_pool, channels=channels)[0]
    return dp
