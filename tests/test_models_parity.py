"""Numerical parity tests against PyTorch oracles.

Each oracle is a fresh torch implementation of the reference architecture's
*behavior* (shapes/ops per SURVEY.md §2.2); weights are ported torch->flax
and forward outputs compared in eval mode. This pins the architecture
equivalence independent of initialization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from med_tpu.config import ExperimentConfig  # noqa: E402
from med_tpu.models import build_model  # noqa: E402
from med_tpu.models.transsvnet import MHA, PoswiseFFN  # noqa: E402


def t2n(t):
    return t.detach().numpy()


def port_dense(w, b=None):
    p = {"kernel": t2n(w).T}
    if b is not None:
        p["bias"] = t2n(b)
    return p


def port_conv1d(w, b):
    # torch (O, I, K) -> flax (K, I, O)
    return {"kernel": t2n(w).transpose(2, 1, 0), "bias": t2n(b)}


def port_bn(bn):
    return (
        {"scale": t2n(bn.weight), "bias": t2n(bn.bias)},
        {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)},
    )


# --------------------------------------------------------------------- CNN
class TorchWindowCNN(tnn.Module):
    """Reference SimpleCNN behavior (models.py:49-131), window 10."""

    def __init__(self, in_features, n_classes=1):
        super().__init__()
        self.c1 = tnn.Conv1d(in_features, 64, 3)
        self.b1 = tnn.BatchNorm1d(64)
        self.c2 = tnn.Conv1d(64, 128, 3)
        self.b2 = tnn.BatchNorm1d(128)
        self.l1 = tnn.Linear(128, 256)
        self.hb1 = tnn.BatchNorm1d(256)
        self.l2 = tnn.Linear(256, 32)
        self.hb2 = tnn.BatchNorm1d(32)
        self.l3 = tnn.Linear(32, 16)
        self.hb3 = tnn.BatchNorm1d(16)
        self.out = tnn.Linear(16, n_classes)

    def forward(self, x):  # x (B, F, W)
        x = self.b1(tF.max_pool1d(self.c1(x), 2, 2))
        x = self.b2(tF.max_pool1d(self.c2(x), 2, 2))
        x = x.flatten(1)
        x = self.hb1(tF.relu(self.l1(x)))
        x = self.hb2(tF.relu(self.l2(x)))
        x = self.hb3(tF.relu(self.l3(x)))
        return self.out(x)


def test_cnn_parity(rng):
    F_in, W = 58, 10
    tm = TorchWindowCNN(F_in).eval()
    # randomize running stats so BN is non-trivial
    for bn in [tm.b1, tm.b2, tm.hb1, tm.hb2, tm.hb3]:
        bn.running_mean.copy_(torch.tensor(rng.normal(size=bn.running_mean.shape), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.random(bn.running_var.shape) + 0.5, dtype=torch.float32))

    cfg = ExperimentConfig(model_name="SimpleCNN")
    model = build_model(cfg)
    x = rng.normal(size=(4, W, F_in)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)

    params = jax.tree.map(lambda a: a, variables["params"])  # unfreeze copy
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])
    params["conv0"] = port_conv1d(tm.c1.weight, tm.c1.bias)
    params["conv1"] = port_conv1d(tm.c2.weight, tm.c2.bias)
    params["bn0"], stats["bn0"] = port_bn(tm.b1)
    params["bn1"], stats["bn1"] = port_bn(tm.b2)
    # flatten order: torch (C, L) c-major vs ours (L, C) l-major
    w = t2n(tm.l1.weight)  # (256, C*L) with index c*L + l
    C, L = 128, 1
    wk = w.reshape(256, C, L).transpose(2, 1, 0).reshape(L * C, 256)
    params["head"]["dense0"] = {"kernel": wk, "bias": t2n(tm.l1.bias)}
    params["head"]["dense1"] = port_dense(tm.l2.weight, tm.l2.bias)
    params["head"]["dense2"] = port_dense(tm.l3.weight, tm.l3.bias)
    params["head"]["out"] = port_dense(tm.out.weight, tm.out.bias)
    for i, bn in enumerate([tm.hb1, tm.hb2, tm.hb3]):
        params["head"][f"bn{i}"], stats["head"][f"bn{i}"] = port_bn(bn)

    got = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    want = t2n(tm(torch.tensor(x).permute(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- LSTM
def test_lstm_parity(rng):
    F_in, W, H = 58, 10, 128
    tlstm = tnn.LSTM(F_in, H, num_layers=3, batch_first=True, dropout=0.2).eval()

    cfg = ExperimentConfig(model_name="SimpleLSTM")
    model = build_model(cfg)
    x = rng.normal(size=(3, W, F_in)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params = jax.tree.map(lambda a: a, variables["params"])

    for layer in range(3):
        w_ih = t2n(getattr(tlstm, f"weight_ih_l{layer}"))  # (4H, in)
        w_hh = t2n(getattr(tlstm, f"weight_hh_l{layer}"))
        b = t2n(getattr(tlstm, f"bias_ih_l{layer}")) + t2n(
            getattr(tlstm, f"bias_hh_l{layer}")
        )
        cell = {}
        for gi, g in enumerate("ifgo"):
            sl = slice(gi * H, (gi + 1) * H)
            cell[f"i{g}"] = {"kernel": w_ih[sl].T}
            cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        params[f"lstm{layer}"] = {"cell": cell}

    feats = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        train=False,
        method="features",
    )
    out_t, _ = tlstm(torch.tensor(x))
    want = t2n(tF.relu(out_t)[:, -1, :])
    np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- TeCNo
class TorchDilatedResidual(tnn.Module):
    """Reference DilatedResidualLayer, causal (models_TCN.py:104-137)."""

    def __init__(self, ch, dilation):
        super().__init__()
        self.dilation = dilation
        self.conv = tnn.Conv1d(ch, ch, 3, padding=2 * dilation, dilation=dilation)
        self.conv1 = tnn.Conv1d(ch, ch, 1)

    def forward(self, x):
        out = tF.relu(self.conv(x))
        out = out[:, :, : -(2 * self.dilation)]
        out = self.conv1(out)
        return x + out


class TorchStage(tnn.Module):
    def __init__(self, layers, fmaps, dim, classes):
        super().__init__()
        self.cin = tnn.Conv1d(dim, fmaps, 1)
        self.blocks = tnn.ModuleList(
            [TorchDilatedResidual(fmaps, 2**i) for i in range(layers)]
        )
        self.cout = tnn.Conv1d(fmaps, classes, 1)

    def forward(self, x):
        out = self.cin(x)
        for b in self.blocks:
            out = b(out)
        return self.cout(out)


def port_stage(ts, n_layers):
    p = {"conv_in": {"Conv_0": port_conv1d(ts.cin.weight, ts.cin.bias)},
         "conv_out": {"Conv_0": port_conv1d(ts.cout.weight, ts.cout.bias)}}
    # residual convs live STACKED per stage (models/layers.py ResidualStack)
    w3 = [port_conv1d(b.conv.weight, b.conv.bias) for b in ts.blocks]
    w1 = [port_conv1d(b.conv1.weight, b.conv1.bias) for b in ts.blocks]
    p["stack"] = {
        "w3": np.stack([c["kernel"] for c in w3]),
        "b3": np.stack([c["bias"] for c in w3]),
        "w1": np.stack([c["kernel"][0] for c in w1]),
        "b1": np.stack([c["bias"] for c in w1]),
    }
    return p


def test_tecno_parity(rng):
    dim, fmaps, classes, layers, T = 40, 16, 2, 5, 60
    t1 = TorchStage(layers, fmaps, dim, classes).eval()
    t2 = TorchStage(layers, fmaps, classes, classes).eval()

    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="video",
        video_dims=dim, out_features=classes, mstcn_layers=layers,
        mstcn_f_maps=fmaps, batch_size=1,
    )
    model = build_model(cfg)
    x = rng.normal(size=(1, T, dim)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params = {"stage0": port_stage(t1, layers), "stage1": port_stage(t2, layers)}

    got = model.apply({"params": params}, jnp.asarray(x), train=False)
    xt = torch.tensor(x).permute(0, 2, 1)
    o1 = t1(xt)
    o2 = t2(torch.softmax(o1, dim=1))
    want = torch.stack([o1, o2]).permute(0, 1, 3, 2)  # (S, B, T, C)
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=1e-4, atol=1e-4)


# -------------------------------------------------------- attention sublayers
class TorchMHA(tnn.Module):
    """Reference MultiHeadAttention with per-forward (unlearned) LayerNorm
    (models_TCN.py:196-232)."""

    def __init__(self, d_model, d_k, d_v, h):
        super().__init__()
        self.wq = tnn.Linear(d_model, d_k * h, bias=False)
        self.wk = tnn.Linear(d_model, d_k * h, bias=False)
        self.wv = tnn.Linear(d_model, d_v * h, bias=False)
        self.fc = tnn.Linear(h * d_v, d_model, bias=False)
        self.d_k, self.d_v, self.h, self.d_model = d_k, d_v, h, d_model

    def forward(self, q_in, k_in, v_in):
        B = q_in.size(0)
        q = self.wq(q_in).view(B, -1, self.h, self.d_k).transpose(1, 2)
        k = self.wk(k_in).view(B, -1, self.h, self.d_k).transpose(1, 2)
        v = self.wv(v_in).view(B, -1, self.h, self.d_v).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / np.sqrt(self.d_k)
        ctx = torch.softmax(s, -1) @ v
        ctx = ctx.transpose(1, 2).reshape(B, -1, self.h * self.d_v)
        out = self.fc(ctx)
        return tF.layer_norm(out + q_in, (self.d_model,))


def test_mha_parity(rng):
    d_model, d_k, h = 16, 8, 4
    tm = TorchMHA(d_model, d_k, d_k, h).eval()
    m = MHA(d_model, d_k, d_k, h)
    q = rng.normal(size=(3, 5, d_model)).astype(np.float32)
    kv = rng.normal(size=(3, 9, d_model)).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    params = {
        "W_Q": port_dense(tm.wq.weight),
        "W_K": port_dense(tm.wk.weight),
        "W_V": port_dense(tm.wv.weight),
        "fc": port_dense(tm.fc.weight),
    }
    got = m.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    want = t2n(tm(torch.tensor(q), torch.tensor(kv), torch.tensor(kv)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_ffn_parity(rng):
    d_model, d_ff = 16, 32
    l1 = tnn.Linear(d_model, d_ff, bias=False)
    l2 = tnn.Linear(d_ff, d_model, bias=False)
    x = rng.normal(size=(3, 5, d_model)).astype(np.float32)
    m = PoswiseFFN(d_model, d_ff)
    m.init(jax.random.key(0), jnp.asarray(x))
    params = {"Dense_0": port_dense(l1.weight), "Dense_1": port_dense(l2.weight)}
    got = m.apply({"params": params}, jnp.asarray(x))
    xt = torch.tensor(x)
    want = t2n(tF.layer_norm(l2(tF.relu(l1(xt))) + xt, (d_model,)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- TransSVNet
def test_transsvnet_parity(rng):
    """Full-model oracle: per-frame window loop + encoder/decoder as in the
    reference Transformer (models_TCN.py:336-385)."""
    fmaps, classes, len_q, dim, T = 8, 2, 6, 20, 25
    h = 8

    enc_attn = TorchMHA(classes, fmaps, fmaps, h).eval()
    enc_ffn1 = tnn.Linear(classes, fmaps, bias=False)
    enc_ffn2 = tnn.Linear(fmaps, classes, bias=False)
    dec_attn = TorchMHA(classes, fmaps, fmaps, h).eval()
    dec_ffn1 = tnn.Linear(classes, fmaps, bias=False)
    dec_ffn2 = tnn.Linear(fmaps, classes, bias=False)
    fc = tnn.Linear(dim, classes, bias=False)

    logits = rng.normal(size=(1, T, classes)).astype(np.float32)
    feats = rng.normal(size=(1, T, dim)).astype(np.float32)

    # oracle forward
    with torch.no_grad():
        x = torch.tensor(logits)  # (1, T, C)
        windows = []
        for i in range(T):
            if i < len_q - 1:
                w = torch.cat([torch.zeros(1, len_q - 1 - i, classes), x[:, : i + 1]], 1)
            else:
                w = x[:, i - len_q + 1 : i + 1]
            windows.append(w)
        enc_in = torch.stack(windows, 0).squeeze(1)  # (T, len_q, C)
        enc = enc_attn(enc_in, enc_in, enc_in)
        enc = tF.layer_norm(enc_ffn2(tF.relu(enc_ffn1(enc))) + enc, (classes,))
        q = torch.tanh(fc(torch.tensor(feats))).transpose(0, 1)  # (T, 1, C)
        dec = dec_attn(q, enc, enc)
        dec = tF.layer_norm(dec_ffn2(tF.relu(dec_ffn1(dec))) + dec, (classes,))
        want = t2n(dec.squeeze(1))  # (T, C)

    cfg = ExperimentConfig(
        model_name="TransSVNet", dataset_type="frame", data_type="video",
        video_dims=dim, out_features=classes, mstcn_f_maps=fmaps,
        sequence_length=len_q, batch_size=1,
    )
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.asarray(logits), jnp.asarray(feats),
        train=False,
    )
    params = {
        "enc_attn0": {
            "W_Q": port_dense(enc_attn.wq.weight),
            "W_K": port_dense(enc_attn.wk.weight),
            "W_V": port_dense(enc_attn.wv.weight),
            "fc": port_dense(enc_attn.fc.weight),
        },
        "enc_ffn0": {"Dense_0": port_dense(enc_ffn1.weight),
                     "Dense_1": port_dense(enc_ffn2.weight)},
        "dec_attn": {
            "W_Q": port_dense(dec_attn.wq.weight),
            "W_K": port_dense(dec_attn.wk.weight),
            "W_V": port_dense(dec_attn.wv.weight),
            "fc": port_dense(dec_attn.fc.weight),
        },
        "dec_ffn": {"Dense_0": port_dense(dec_ffn1.weight),
                    "Dense_1": port_dense(dec_ffn2.weight)},
        "fc": port_dense(fc.weight),
    }
    got = model.apply(
        {"params": params}, jnp.asarray(logits), jnp.asarray(feats), train=False
    )
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4, atol=1e-5)


def test_transsvnet_packed_encoder_matches_windows(rng):
    """TransSVNet(packed=True) — the banded-kernel encoder — equals the
    windowed-einsum path exactly: outputs and gradients, for T both below
    and above the window length (zero-padded early windows included)."""
    from med_tpu.models.transsvnet import TransSVNet

    for T in (9, 47):
        fmaps, classes, len_q, dim, h = 8, 3, 6, 12, 4
        logits = jnp.asarray(rng.normal(size=(1, T, classes)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(1, T, dim)), jnp.float32)
        mp = TransSVNet(f_maps=fmaps, out_classes=classes, len_q=len_q,
                        in_dim=dim, n_heads=h, packed=True)
        mu = TransSVNet(f_maps=fmaps, out_classes=classes, len_q=len_q,
                        in_dim=dim, n_heads=h, packed=False)
        v = mp.init(jax.random.key(0), logits, feats)
        a = mp.apply(v, logits, feats)
        b = mu.apply(v, logits, feats)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

        probe = jnp.sin(jnp.arange(a.size).reshape(a.shape) * 0.1)

        def loss(m):
            def f(params, lg):
                return jnp.sum(m.apply({"params": params}, lg, feats) * probe)
            return f

        ga = jax.grad(loss(mp), argnums=(0, 1))(v["params"], logits)
        gb = jax.grad(loss(mu), argnums=(0, 1))(v["params"], logits)
        for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)
