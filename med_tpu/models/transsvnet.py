"""TransSVNet: transformer refiner over frozen TeCNo logits (frame level).

Reference ``Transformer`` (models_TCN.py:176-385). Per frame t it
self-attends a zero-padded window of the last len_q=30 TeCNo class-logit
vectors (1 encoder layer, 8 heads, d_k=d_v=f_maps), then a single decoder
token — tanh(fc(frame's long feature)) — cross-attends the encoded window.
Every LayerNorm in the reference is created inside forward and therefore
unlearned (models_TCN.py:232, :251); :func:`med_tpu.ops.attention.layer_norm`
reproduces that. The per-frame window materialization loop
(models_TCN.py:373-380) becomes the fused sliding-window attention op for
the encoder's first sublayer; subsequent sublayers operate on the already
windowed (T, len_q, C) activations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import layer_norm, sliding_windows
from .layers import torch_default_kernel


class _Kernel(nn.Module):
    """Holds the (d_in, d_out) ``kernel`` of an ``nn.Dense(use_bias=False)``
    under the same scope name, for einsum-applied projections."""

    d_out: int

    @nn.compact
    def __call__(self, d_in: int):
        return self.param("kernel", torch_default_kernel, (d_in, self.d_out))


class MHA(nn.Module):
    """Projections + scaled-dot-product + output proj + unlearned LN
    (reference MultiHeadAttention, models_TCN.py:196-232).

    TPU-first restructure (round 3): the model/channel width here is the
    CLASS width (d_model = out_classes, typically 2), far below d_k = 64, so
    the projection pairs collapse algebraically —

        scores = (x W_Qh)(y W_Kh)^T / sqrt(d_k) = x A_h y^T,
            A_h = W_Qh W_Kh^T / sqrt(d_k)           (d_model, d_model)
        out   = Σ_h P_h (y W_Vh) fc_h = Σ_h P_h y M_h,
            M_h = W_Vh fc_h                          (d_model, d_model)

    so the (B, H, L, 64) q/k/v/ctx tensors (≈250 MB each per TSVN trial at
    T=4096·W=30) never exist: only (H, d_model, d_model) mixing matrices and
    the irreducible (B, H, Lq, Lk) attention weights. Exact same math, same
    param tree ("W_Q/W_K/W_V/fc" kernels, unchanged shapes/init), so
    reference-checkpoint import and all parity oracles are unaffected."""

    d_model: int
    d_k: int
    d_v: int
    n_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        import math as _math

        d_in_q = q_in.shape[-1]
        d_in_kv = k_in.shape[-1]
        wq = _Kernel(self.d_k * self.n_heads, name="W_Q")(d_in_q)
        wk = _Kernel(self.d_k * self.n_heads, name="W_K")(d_in_kv)
        wv = _Kernel(self.d_v * self.n_heads, name="W_V")(d_in_kv)
        fc = _Kernel(self.d_model, name="fc")(self.n_heads * self.d_v)

        A = jnp.einsum(
            "dhk,ehk->hde",
            wq.reshape(d_in_q, self.n_heads, self.d_k),
            wk.reshape(d_in_kv, self.n_heads, self.d_k),
        ) / _math.sqrt(self.d_k)                      # (H, d_q, d_kv)
        M = jnp.einsum(
            "ehv,hvm->hem",
            wv.reshape(d_in_kv, self.n_heads, self.d_v),
            fc.reshape(self.n_heads, self.d_v, self.d_model),
        )                                             # (H, d_kv, d_model)

        scores = jnp.einsum("bld,hde,bme->bhlm", q_in, A, k_in)
        p = jax.nn.softmax(scores, axis=-1)           # (B, H, Lq, Lk)
        w = jnp.einsum("bhlm,bme->bhle", p, v_in)     # (B, H, Lq, d_kv)
        out = jnp.einsum("bhle,hem->blm", w, M)
        return layer_norm(out + q_in)


class PoswiseFFN(nn.Module):
    """Position-wise FFN with unlearned LN (reference models_TCN.py:235-251)."""

    d_model: int
    d_ff: int

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.d_ff, use_bias=False, kernel_init=torch_default_kernel)(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, kernel_init=torch_default_kernel)(y)
        return layer_norm(y + x)


class TransSVNet(nn.Module):
    f_maps: int = 64          # d_k = d_v = d_ff
    out_classes: int = 2      # d_model
    len_q: int = 30
    in_dim: int = 2048        # long-feature width
    n_heads: int = 8
    n_enc_layers: int = 1

    @nn.compact
    def __call__(self, tecno_logits, long_features, train: bool = False):
        """tecno_logits (B, T, C), long_features (B, T, in_dim) -> (B, T, C).

        Designed for B=1 trials (reference batch_size=1); frames act as the
        attention batch.
        """
        B, T, C = tecno_logits.shape
        x = tecno_logits.reshape(B * T, C)
        windows = sliding_windows(x, self.len_q) if B == 1 else _batched_windows(
            tecno_logits, self.len_q
        )
        # encoder: self-attention over the window + FFN. (A banded
        # shared-score formulation — overlapping windows share pair scores,
        # collapsing the (T, W, W) attention to a (T+W-1, 2W-1) band +
        # prefix sums — was tried and is SLOWER here: ~120 small
        # slice/cumsum ops lose to the batched MXU matmuls in this
        # latency-bound regime; see CLAUDE.md round-2 notes.)
        enc = windows
        for i in range(self.n_enc_layers):
            enc = MHA(C, self.f_maps, self.f_maps, self.n_heads,
                      name=f"enc_attn{i}")(enc, enc, enc)
            enc = PoswiseFFN(C, self.f_maps, name=f"enc_ffn{i}")(enc)

        # decoder: one query token per frame cross-attends its window
        feas = jnp.tanh(
            nn.Dense(C, use_bias=False, kernel_init=torch_default_kernel, name="fc")(
                long_features
            )
        )
        q = feas.reshape(B * T, 1, C)
        dec = MHA(C, self.f_maps, self.f_maps, self.n_heads, name="dec_attn")(
            q, enc, enc
        )
        dec = PoswiseFFN(C, self.f_maps, name="dec_ffn")(dec)
        return dec.reshape(B, T, C)


def _batched_windows(x, len_q):
    return jax.vmap(lambda s: sliding_windows(s, len_q))(x).reshape(
        -1, len_q, x.shape[-1]
    )
