"""Sequence-parallel TransSVNet: the frozen-TeCNo -> transformer-refiner
family (reference models_TCN.py:176-385, train_frame TSVN regime) with the
trial's T axis sharded over the mesh.

SP decomposition (see :mod:`.seqpar` for the design rules):

- the frozen TeCNo upstream runs through :func:`..seqpar.sp_tecno_forward`
  (distributed causal taps), its last-stage logits stop-gradiented exactly
  like the single-chip engine (train/engine.py:212-224);
- the encoder self-attends each frame's window of the last ``len_q`` logit
  vectors: one :func:`..sp_cog.halo_left` exchange of ``len_q - 1`` rows
  (zero fill at the global edge — the reference zero-pads its windows,
  ops/attention.py::sliding_windows) makes every window shard-local;
- the decoder (per-frame query token cross-attending its own window), the
  collapsed-MHA mixing matrices and all LayerNorms are frame-local;
- the soft-CE loss is a masked mean over global T: one psum pair.

Functions consume the stock ``TransSVNet`` param tree (models/transsvnet.py)
— same checkpoints, importers and oracles."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import layer_norm
from .sp_cog import halo_left


def _mix(p, d_in_q: int, d_in_kv: int, d_k: int, d_v: int, n_heads: int,
         d_model: int):
    """The collapsed (H, d, d) score/value mixing matrices of
    models/transsvnet.py::MHA._mix (same math, functional)."""
    wq = p["W_Q"]["kernel"]
    wk = p["W_K"]["kernel"]
    wv = p["W_V"]["kernel"]
    fc = p["fc"]["kernel"]
    A = jnp.einsum(
        "dhk,ehk->hde",
        wq.reshape(d_in_q, n_heads, d_k),
        wk.reshape(d_in_kv, n_heads, d_k),
    ) / math.sqrt(d_k)
    M = jnp.einsum(
        "ehv,hvm->hem",
        wv.reshape(d_in_kv, n_heads, d_v),
        fc.reshape(n_heads, d_v, d_model),
    )
    return A, M


def _mha(p, q_in, k_in, v_in, *, d_k: int, d_v: int, n_heads: int):
    """MHA.__call__ (windows path): collapsed projections + softmax +
    residual + unlearned LN. All operands are frame-local (B = local
    frames)."""
    d_model = q_in.shape[-1]
    A, M = _mix(p, q_in.shape[-1], k_in.shape[-1], d_k, d_v, n_heads,
                d_model)
    scores = jnp.einsum("bld,hde,bme->bhlm", q_in, A, k_in)
    attn = jax.nn.softmax(scores, axis=-1)
    w = jnp.einsum("bhlm,bme->bhle", attn, v_in)
    out = jnp.einsum("bhle,hem->blm", w, M)
    return layer_norm(out + q_in)


def _ffn(p, x):
    """PoswiseFFN: relu(x W1) W2 + residual + unlearned LN."""
    y = jax.nn.relu(x @ p["Dense_0"]["kernel"]) @ p["Dense_1"]["kernel"]
    return layer_norm(y + x)


def sp_tsvn_forward(params, tecno_logits, long_features, *, len_q: int = 30,
                    f_maps: int = 64, n_heads: int = 8,
                    axis_name: str = "data"):
    """TransSVNet forward on T-sharded blocks: tecno_logits (T_local, C),
    long_features (T_local, in_dim) -> (T_local, C) refined logits.

    One halo exchange of ``len_q - 1`` logit rows (zeros at the global
    edge, matching the reference's zero-padded windows) makes every
    frame's window local; everything downstream is frame-local."""
    T, C = tecno_logits.shape
    halo = halo_left(tecno_logits, len_q - 1, axis_name)
    seq = jnp.concatenate([halo, tecno_logits], axis=0)  # (T + W - 1, C)
    idx = jnp.arange(T)[:, None] + jnp.arange(len_q)[None, :]
    windows = seq[idx]                                   # (T, W, C)

    enc = _mha(params["enc_attn0"], windows, windows, windows,
               d_k=f_maps, d_v=f_maps, n_heads=n_heads)
    enc = _ffn(params["enc_ffn0"], enc)

    feas = jnp.tanh(long_features @ params["fc"]["kernel"])
    q = feas.reshape(T, 1, C)
    dec = _mha(params["dec_attn"], q, enc, enc,
               d_k=f_maps, d_v=f_maps, n_heads=n_heads)
    dec = _ffn(params["dec_ffn"], dec)
    return dec.reshape(T, C)


def sp_tsvn_loss(params, frozen_tecno_params, x, labels, mask, *,
                 num_stages: int, len_q: int = 30, f_maps: int = 64,
                 n_heads: int = 8, axis_name: str = "data"):
    """The engine's TSVN objective (train/engine.py:212-224 + the 'tsvn'
    branch of _loss_for_family): frozen TeCNo (stop-gradient at its INPUT)
    -> refiner -> soft CE over global T. All inputs (T_local, ...) blocks."""
    from .seqpar import sp_tecno_forward

    x_frozen = lax.stop_gradient(x)
    tecno_out = sp_tecno_forward(
        frozen_tecno_params, x_frozen, num_stages=num_stages,
        axis_name=axis_name, masks=None, dropout_rate=0.0)
    tecno_logits = lax.stop_gradient(tecno_out[-1])  # (T_local, C)

    out = sp_tsvn_forward(
        params, tecno_logits, x, len_q=len_q, f_maps=f_maps,
        n_heads=n_heads, axis_name=axis_name)
    y = labels.astype(out.dtype)
    targets = jnp.stack([1.0 - y, y], axis=-1)
    logp = jax.nn.log_softmax(out, axis=-1)
    per = -jnp.sum(targets * logp, axis=-1)
    m = mask.astype(out.dtype)
    num = lax.psum(jnp.sum(per * m), axis_name)
    den = lax.psum(jnp.sum(m), axis_name)
    return num / jnp.maximum(den, 1e-12)
