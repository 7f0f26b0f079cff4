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

from ..ops.attention import (
    layer_norm,
    sliding_window_attention_packed,
    sliding_windows,
)
from .layers import torch_default_kernel


class _Kernel(nn.Module):
    """Holds the (d_in, d_out) ``kernel`` of an ``nn.Dense(use_bias=False)``
    under the same scope name, for einsum-applied projections."""

    d_out: int

    @nn.compact
    def __call__(self, d_in: int):
        return self.param("kernel", torch_default_kernel, (d_in, self.d_out))


def _ln0(x, eps: float = 1e-5):
    """Affine-free layer norm over AXIS 0 of a feature-major (C, N) tensor —
    the packed-layout equivalent of :func:`med_tpu.ops.attention.layer_norm`
    on the moved axis."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


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

    def setup(self):
        self.W_Q = _Kernel(self.d_k * self.n_heads)
        self.W_K = _Kernel(self.d_k * self.n_heads)
        self.W_V = _Kernel(self.d_v * self.n_heads)
        self.fc = _Kernel(self.d_model)

    def _mix(self, d_in_q: int, d_in_kv: int):
        """The collapsed (H, d, d) score/value mixing matrices."""
        import math as _math

        wq = self.W_Q(d_in_q)
        wk = self.W_K(d_in_kv)
        wv = self.W_V(d_in_kv)
        fc = self.fc(self.n_heads * self.d_v)
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
        return A, M

    def __call__(self, q_in, k_in, v_in):
        A, M = self._mix(q_in.shape[-1], k_in.shape[-1])
        scores = jnp.einsum("bld,hde,bme->bhlm", q_in, A, k_in)
        p = jax.nn.softmax(scores, axis=-1)           # (B, H, Lq, Lk)
        w = jnp.einsum("bhlm,bme->bhle", p, v_in)     # (B, H, Lq, d_kv)
        out = jnp.einsum("bhle,hem->blm", w, M)
        return layer_norm(out + q_in)

    def self_window_packed(self, x, window: int, use_pallas: bool = True):
        """Windowed SELF-attention over a (T, C) sequence, packed layout.

        Equivalent to ``self(win, win, win)`` with
        ``win = sliding_windows(x, window)`` — every window's L×L attention
        — but computed through the banded sliding-window kernel
        (:func:`med_tpu.ops.attention.sliding_window_attention_packed`,
        m = window positions per window, key band = the base sequence): the
        (T, H, L, L) score tensor XLA materializes for the einsum version
        lane-pads its 30-wide minor dims to 128 (≈4.3x physical; its
        softmax fwd+bwd alone were ~1 ms of the TSVN step profile), while
        the kernel's banded tiles stay dense in VMEM. Overlapping windows
        share their key rows by construction, so k/v project ONCE per frame
        instead of once per (window, position).

        Returns the encoded windows FEATURE-MAJOR (C, T*window), token
        n = t*window + i; ``out.T.reshape(T, window, C)`` recovers the
        window-major layout.
        """
        import math as _math

        T, C = x.shape
        H = self.n_heads
        A, M = self._mix(C, C)
        # the kernel scales scores by 1/sqrt(packed dk) = 1/sqrt(C); A
        # already carries the reference's 1/sqrt(d_k) — pre-compensate
        A = A * _math.sqrt(C)

        # per-head A-transformed queries + the raw rows (residual/LN input),
        # windowed TOGETHER so one lane-padded transpose covers both. The
        # replication itself is ONE identity-kernel conv (channels = the
        # window offsets): sliding_windows' gather VJP is a ~210 us
        # scatter-add, and a W-slice stack is ~250 us of per-op fixed cost
        # (60 tiny slice/add ops), while the conv fwd/bwd pair is two MXU
        # ops on a 16M-MAC problem.
        qa = jnp.einsum("tc,hce->the", x, A)           # (T, H, C)
        xcat = jnp.concatenate([qa.reshape(T, H * C), x], axis=1)
        xp3 = jnp.pad(xcat, ((window - 1, 0), (0, 0))).T[:, None, :]
        eye = jnp.eye(window, dtype=x.dtype)[:, None, :]   # (W, 1, W) "HIO"
        win3 = jax.lax.conv_general_dilated(
            xp3, eye, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "HIO", "NCH"))   # ((H+1)C, W, T)
        packed = win3.transpose(0, 2, 1).reshape((H + 1) * C, T * window)
        qp = packed[:H * C].reshape(H, C, T * window)
        resid = packed[H * C:]                         # (C, N) raw windows

        kp = jnp.broadcast_to(x.T[None], (H, C, T))
        vp = jnp.einsum("tc,hce->het", x, M)           # (H, C, T)
        ctx = sliding_window_attention_packed(
            qp, kp, vp, window, window, use_pallas)    # (H, C, N)
        return _ln0(jnp.sum(ctx, axis=0) + resid)


class PoswiseFFN(nn.Module):
    """Position-wise FFN with unlearned LN (reference models_TCN.py:235-251).

    Setup-style with the historical auto-names Dense_0/Dense_1, so the param
    tree (and the importers keyed on it) is unchanged; ``packed`` applies the
    same weights to a feature-major (C, N) activation without relayouts."""

    d_model: int
    d_ff: int

    def setup(self):
        self.Dense_0 = _Kernel(self.d_ff)
        self.Dense_1 = _Kernel(self.d_model)

    def __call__(self, x):
        y = nn.relu(x @ self.Dense_0(x.shape[-1]))
        y = y @ self.Dense_1(self.d_ff)
        return layer_norm(y + x)

    def packed(self, x):
        """x (C, N) feature-major -> (C, N)."""
        w1 = self.Dense_0(x.shape[0])
        w2 = self.Dense_1(self.d_ff)
        y = nn.relu(jnp.einsum("cf,cn->fn", w1, x))
        y = jnp.einsum("fc,fn->cn", w2, y)
        return _ln0(y + x)


class TransSVNet(nn.Module):
    f_maps: int = 64          # d_k = d_v = d_ff
    out_classes: int = 2      # d_model
    len_q: int = 30
    in_dim: int = 2048        # long-feature width
    n_heads: int = 8
    n_enc_layers: int = 1
    packed: bool = True       # banded-kernel encoder (B=1, 1 enc layer)

    @nn.compact
    def __call__(self, tecno_logits, long_features, train: bool = False):
        """tecno_logits (B, T, C), long_features (B, T, in_dim) -> (B, T, C).

        Designed for B=1 trials (reference batch_size=1); frames act as the
        attention batch.
        """
        B, T, C = tecno_logits.shape
        if self.packed and B == 1 and self.n_enc_layers == 1:
            # packed encoder: the window self-attention rides the banded
            # sliding-window kernel (keys project once per FRAME — the
            # overlapping windows share them) and the FFN runs feature-major,
            # so no (T, H, 30, 30) score tensor or (T, 30, C) activation is
            # materialized outside the final decoder handoff. Equality with
            # the windows path is pinned by tests/test_models_parity.py.
            encp = MHA(C, self.f_maps, self.f_maps, self.n_heads,
                       name="enc_attn0").self_window_packed(
                           tecno_logits[0], self.len_q)
            encp = PoswiseFFN(C, self.f_maps, name="enc_ffn0").packed(encp)
            enc = encp.T.reshape(T, self.len_q, C)
        else:
            windows = (sliding_windows(tecno_logits[0], self.len_q)
                       if B == 1 else _batched_windows(tecno_logits, self.len_q))
            # encoder: self-attention over the window + FFN. (A banded
            # shared-score XLA formulation — prefix sums over the (T+W-1,
            # 2W-1) score band — was tried and is SLOWER: ~120 small
            # slice/cumsum ops; see CLAUDE.md round-2 notes. The packed
            # branch above is the round-3 kernel answer.)
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
