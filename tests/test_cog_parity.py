"""COG chain-of-gesture block parity vs a torch oracle.

The oracle transcribes the reference behavior (models_COG.py:100-176,
222-258): per-frame zero-padded visual windows, learned pre-norms
(norm1/norm3/Encoder norm), *unlearned* per-forward LayerNorm inside the
attention, no output projection (context concatenation only), and the final
single-head attention over the original text tokens. Verifies the fused
sliding-window attention path (including the norm-of-zero-pad = β subtlety).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from med_tpu.models.cog import ChainOfGestureTransformer  # noqa: E402


def t2n(t):
    return t.detach().numpy()


def port_dense(w):
    return {"kernel": t2n(w).T}


def port_ln(ln):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


class TorchCOGAttention(tnn.Module):
    """MultiHeadAttention_COG: no output projection, unlearned LN."""

    def __init__(self, d_model, d_q, h):
        super().__init__()
        self.wq = tnn.Linear(d_model, d_q * h, bias=False)
        self.wk = tnn.Linear(d_model, d_q * h, bias=False)
        self.wv = tnn.Linear(d_model, d_q * h, bias=False)
        self.d_q, self.h, self.d_model = d_q, h, d_model

    def forward(self, q_in, k_in, v_in):
        B = q_in.size(0)
        q = self.wq(q_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        k = self.wk(k_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        v = self.wv(v_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / np.sqrt(self.d_q)
        ctx = torch.softmax(s, -1) @ v
        ctx = ctx.transpose(1, 2).reshape(B, -1, self.h * self.d_q)
        return tF.layer_norm(ctx + q_in, (self.d_model,))


class TorchCOGEncoderLayer(tnn.Module):
    def __init__(self, d_model, d_ff, d_q, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm3 = tnn.LayerNorm(d_model)
        self.attn = TorchCOGAttention(d_model, d_q, h)
        self.ffn1 = tnn.Linear(d_model, d_ff, bias=False)
        self.ffn2 = tnn.Linear(d_ff, d_model, bias=False)
        self.d_model = d_model

    def forward(self, q, k, v):
        q = self.norm1(q)
        out = self.attn(q, k, v)
        out = self.norm3(out)
        return tF.layer_norm(self.ffn2(tF.relu(self.ffn1(out))) + out, (self.d_model,))


def test_chain_of_gesture_parity(rng):
    f_dim, gest_dim, d_model, d_q, len_q, h, M, T = 24, 12, 16, 2, 5, 8, 7, 33

    lin1 = tnn.Linear(f_dim, d_model, bias=False)
    lin2 = tnn.Linear(gest_dim, d_model, bias=False)
    enc_norm = tnn.LayerNorm(d_model)
    layers = [TorchCOGEncoderLayer(d_model, f_dim, d_q, h) for _ in range(2)]
    final = TorchCOGAttention(d_model, d_model, 1)
    # randomize learned LN affines so the pad-row β path is exercised
    with torch.no_grad():
        for ln in [enc_norm, layers[0].norm1, layers[0].norm3,
                   layers[1].norm1, layers[1].norm3]:
            ln.weight.copy_(torch.tensor(rng.normal(1.0, 0.2, d_model), dtype=torch.float32))
            ln.bias.copy_(torch.tensor(rng.normal(0.0, 0.3, d_model), dtype=torch.float32))

    gest = rng.normal(size=(M, gest_dim)).astype(np.float32)
    feats = rng.normal(size=(T, f_dim)).astype(np.float32)

    # ---- oracle forward (literal reference semantics) ----
    with torch.no_grad():
        visual = lin1(torch.tensor(feats))[None]  # (1, T, d_model)
        text0 = lin2(torch.tensor(gest))[None]    # (1, M, d_model)
        wins = []
        for i in range(T):
            if i < len_q - 1:
                w = torch.cat(
                    [torch.zeros(1, len_q - 1 - i, d_model), visual[:, : i + 1]], 1
                )
            else:
                w = visual[:, i - len_q + 1 : i + 1]
            wins.append(w)
        vis_w = torch.stack(wins, 0).squeeze(1)         # (T, len_q, d_model)
        text = text0.expand(T, M, d_model).contiguous()  # (T, M, d_model)
        vis_w = enc_norm(vis_w)
        for layer in layers:
            text = layer(text, vis_w, vis_w)
        out = final(text, text0.expand(T, M, d_model), text0.expand(T, M, d_model))
        want = t2n(out.reshape(T, -1))

    # ---- framework forward ----
    m = ChainOfGestureTransformer(
        f_dim, gest_dim, d_model, d_q, len_q, n_heads=h, n_layers=2,
        use_pallas=False,
    )
    variables = m.init(jax.random.key(0), jnp.asarray(gest), jnp.asarray(feats))
    params = {
        "linear1": port_dense(lin1.weight),
        "linear2": port_dense(lin2.weight),
        "enc_norm": port_ln(enc_norm),
        "atten": {
            "W_Q": port_dense(final.wq.weight),
            "W_K": port_dense(final.wk.weight),
            "W_V": port_dense(final.wv.weight),
        },
    }
    for i, layer in enumerate(layers):
        params[f"layer{i}"] = {
            "norm1": port_ln(layer.norm1),
            "norm3": port_ln(layer.norm3),
            "W_Q": port_dense(layer.attn.wq.weight),
            "W_K": port_dense(layer.attn.wk.weight),
            "W_V": port_dense(layer.attn.wv.weight),
            "ffn": {"Dense_0": port_dense(layer.ffn1.weight),
                    "Dense_1": port_dense(layer.ffn2.weight)},
        }
    got = m.apply({"params": params}, jnp.asarray(gest), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_chain_pallas_interpret_matches_xla(rng):
    """The Pallas banded kernel and the XLA gather path agree inside the
    full chain block."""
    f_dim, gest_dim, d_model, d_q, len_q, h, M, T = 24, 12, 16, 2, 5, 8, 7, 33
    gest = rng.normal(size=(M, gest_dim)).astype(np.float32)
    feats = rng.normal(size=(T, f_dim)).astype(np.float32)

    m_x = ChainOfGestureTransformer(f_dim, gest_dim, d_model, d_q, len_q,
                                    n_heads=h, use_pallas=False)
    variables = m_x.init(jax.random.key(0), jnp.asarray(gest), jnp.asarray(feats))
    out_x = m_x.apply(variables, jnp.asarray(gest), jnp.asarray(feats))

    import med_tpu.ops.attention as A
    orig = A.sliding_window_attention_packed

    def forced_pallas(q, k, v, window, m, use_pallas=True):
        return A.sliding_window_attention_packed_fwd(q, k, v, window, m,
                                                     tile=16, interpret=True)

    A.sliding_window_attention_packed = forced_pallas
    try:
        import med_tpu.models.cog as cog_mod
        cog_mod.sliding_window_attention_packed = forced_pallas
        m_p = ChainOfGestureTransformer(f_dim, gest_dim, d_model, d_q, len_q,
                                        n_heads=h, use_pallas=True)
        out_p = m_p.apply(variables, jnp.asarray(gest), jnp.asarray(feats))
    finally:
        A.sliding_window_attention_packed = orig
        cog_mod.sliding_window_attention_packed = orig
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)
