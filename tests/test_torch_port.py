"""Reference-checkpoint import: build torch modules with the reference's
state_dict key layout, save a ``best_model`` blob, import it, and verify
end-to-end logit parity (the SURVEY §7 parity harness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from med_tpu.config import ExperimentConfig  # noqa: E402
from med_tpu.models import build_feature_extractor, build_model  # noqa: E402
from med_tpu.utils.torch_port import import_reference_checkpoint  # noqa: E402


def ref_style_feature_extractor(video_dims=32):
    """torch module with the reference's key names (models.py:19-31)."""
    seq = tnn.Sequential()
    seq.add_module("linear_0", tnn.Linear(2048, 512))
    seq.add_module("relu_0", tnn.ReLU())
    seq.add_module("linear_1", tnn.Linear(512, 256))
    seq.add_module("relu_1", tnn.ReLU())
    seq.add_module("output", tnn.Linear(256, video_dims))
    m = tnn.Module()
    m.linear = seq
    return m


def ref_style_cnn(in_features=58, n_classes=1):
    """window-10 CNN with the reference's Sequential layout (models.py:66-111)."""
    m = tnn.Module()
    m.convolutional_layers = tnn.Sequential(
        tnn.Conv1d(in_features, 64, 3), tnn.MaxPool1d(2, 2), tnn.Dropout(0.2),
        tnn.BatchNorm1d(64),
        tnn.Conv1d(64, 128, 3), tnn.MaxPool1d(2, 2), tnn.Dropout(0.2),
        tnn.BatchNorm1d(128), tnn.Flatten(),
    )
    m.linear_layers = tnn.Sequential(
        tnn.Linear(128, 256), tnn.ReLU(), tnn.BatchNorm1d(256),
        tnn.Linear(256, 32), tnn.ReLU(), tnn.BatchNorm1d(32),
        tnn.Linear(32, 16), tnn.ReLU(), tnn.BatchNorm1d(16),
        tnn.Linear(16, n_classes),
    )
    return m


def ref_style_lstm(in_features=58, n_classes=1):
    m = tnn.Module()
    m.lstm = tnn.LSTM(in_features, 128, num_layers=3, batch_first=True,
                      dropout=0.2)
    m.linear_layers = tnn.Sequential(
        tnn.Flatten(), tnn.Linear(128, 256), tnn.ReLU(), tnn.BatchNorm1d(256),
        tnn.Linear(256, 64), tnn.ReLU(), tnn.BatchNorm1d(64),
        tnn.Linear(64, n_classes),
    )
    return m


def torch_forward_cnn(m, fe, x_img, x_kin):
    with torch.no_grad():
        m.eval(); fe_seq = fe.linear.eval()
        feats = fe_seq(torch.tensor(x_img))
        inp = torch.cat([feats, torch.tensor(x_kin)], dim=2).permute(0, 2, 1)
        h = m.convolutional_layers(inp)
        return m.linear_layers(h).numpy()


def torch_forward_lstm(m, fe, x_img, x_kin):
    with torch.no_grad():
        m.eval(); fe_seq = fe.linear.eval()
        feats = fe_seq(torch.tensor(x_img))
        inp = torch.cat([feats, torch.tensor(x_kin)], dim=2)  # (B, W, F)
        out, _ = m.lstm(inp)
        out = tF.relu(out)[:, -1, :]
        return m.linear_layers(out).numpy()


@pytest.mark.parametrize("model_name", ["SimpleCNN", "SimpleLSTM"])
def test_reference_checkpoint_logit_parity(tmp_path, rng, model_name):
    fe_t = ref_style_feature_extractor()
    model_t = ref_style_cnn() if model_name == "SimpleCNN" else ref_style_lstm()
    # randomize BN running stats
    for mod in model_t.modules():
        if isinstance(mod, tnn.BatchNorm1d):
            mod.running_mean.copy_(torch.tensor(
                rng.normal(size=mod.running_mean.shape), dtype=torch.float32))
            mod.running_var.copy_(torch.tensor(
                rng.random(mod.running_var.shape) + 0.5, dtype=torch.float32))

    path = str(tmp_path / "best_model_LOSO_1Out.pt")
    torch.save({"feature_extractor": fe_t.state_dict(),
                "model": model_t.state_dict()}, path)

    imported = import_reference_checkpoint(path, model_name)

    cfg = ExperimentConfig(model_name=model_name)
    model = build_model(cfg)
    fe = build_feature_extractor(cfg)
    B, W = 4, 10
    x_img = rng.normal(size=(B, W, 2048)).astype(np.float32)
    x_kin = rng.normal(size=(B, W, 26)).astype(np.float32)

    feats = fe.apply({"params": imported["params"]["fe"]}, jnp.asarray(x_img))
    inp = jnp.concatenate([feats, jnp.asarray(x_kin)], axis=-1)
    got = model.apply(
        {"params": imported["params"]["model"],
         "batch_stats": imported["batch_stats"]["model"]},
        inp, train=False,
    )
    fwd = torch_forward_cnn if model_name == "SimpleCNN" else torch_forward_lstm
    want = fwd(model_t, fe_t, x_img, x_kin)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ frame families
# oracle building blocks shared with the full-COG parity test
from test_cog_full_parity import RefDilatedResidual, RefFFN  # noqa: E402

from med_tpu.models.tcn import TeCNo  # noqa: E402
from med_tpu.models.transsvnet import TransSVNet  # noqa: E402


class RefSingleStage(tnn.Module):
    """models_TCN.py:76-101 with the reference's key names."""

    def __init__(self, num_layers, f_maps, dim, n_classes):
        super().__init__()
        self.conv_1x1 = tnn.Conv1d(dim, f_maps, 1)
        self.layers = tnn.ModuleList(
            [RefDilatedResidual(2 ** i, f_maps) for i in range(num_layers)])
        self.conv_out_classes = tnn.Conv1d(f_maps, n_classes, 1)

    def forward(self, x):
        out = self.conv_1x1(x)
        for layer in self.layers:
            out = layer(out)
        return self.conv_out_classes(out)


class RefMultiStage(tnn.Module):
    """MultiStageModel (models_TCN.py:17-53): stage1 + refinement stages on
    channel-softmaxed logits."""

    def __init__(self, stages, num_layers, f_maps, dim, n_classes):
        super().__init__()
        self.stage1 = RefSingleStage(num_layers, f_maps, dim, n_classes)
        self.stages = tnn.ModuleList(
            [RefSingleStage(num_layers, f_maps, n_classes, n_classes)
             for _ in range(stages - 1)])

    def forward(self, x):
        out = self.stage1(x)
        outputs = out.unsqueeze(0)
        for s in self.stages:
            out = s(torch.softmax(out, dim=1))
            outputs = torch.cat((outputs, out.unsqueeze(0)), dim=0)
        return outputs


def test_tecno_import_parity(tmp_path, rng):
    torch.manual_seed(1)
    S, L, F, DIM, C, T = 2, 3, 8, 12, 3, 40
    oracle = RefMultiStage(S, L, F, DIM, C).eval()
    x = rng.normal(size=(1, T, DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x).permute(0, 2, 1)).numpy().transpose(0, 1, 3, 2)

    path = str(tmp_path / "best_model_LOSO_1Out.pt")
    torch.save({"feature_extractor": None, "model": oracle.state_dict()}, path)
    imported = import_reference_checkpoint(path, "TeCNo")

    model = TeCNo(num_stages=S, num_layers=L, f_maps=F, in_dim=DIM, out_classes=C)
    got = model.apply({"params": imported["params"]["model"]},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class RefTSVNMHA(tnn.Module):
    """MultiHeadAttention (models_TCN.py:196-232): output proj applied,
    unlearned closing LN."""

    def __init__(self, d_model, d_k, d_v, h):
        super().__init__()
        self.W_Q = tnn.Linear(d_model, d_k * h, bias=False)
        self.W_K = tnn.Linear(d_model, d_k * h, bias=False)
        self.W_V = tnn.Linear(d_model, d_v * h, bias=False)
        self.fc = tnn.Linear(h * d_v, d_model, bias=False)
        self.d_k, self.d_v, self.h, self.d_model = d_k, d_v, h, d_model

    def forward(self, q_in, k_in, v_in):
        B = q_in.size(0)
        q = self.W_Q(q_in).view(B, -1, self.h, self.d_k).transpose(1, 2)
        k = self.W_K(k_in).view(B, -1, self.h, self.d_k).transpose(1, 2)
        v = self.W_V(v_in).view(B, -1, self.h, self.d_v).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / np.sqrt(self.d_k)
        ctx = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(
            B, -1, self.h * self.d_v)
        return tF.layer_norm(self.fc(ctx) + q_in, (self.d_model,))


def ref_style_transsvnet(f_maps, n_classes, in_dim, h=8):
    """Transformer (models_TCN.py:336-367) with the reference's key names:
    ``transformer.encoder.layers.{i}`` / ``transformer.decoder.layers.0``."""
    def enc_layer():
        m = tnn.Module()
        m.enc_self_attn = RefTSVNMHA(n_classes, f_maps, f_maps, h)
        m.pos_ffn = RefFFN(n_classes, f_maps)
        return m

    def dec_layer():
        m = tnn.Module()
        m.dec_enc_attn = RefTSVNMHA(n_classes, f_maps, f_maps, h)
        m.pos_ffn = RefFFN(n_classes, f_maps)
        return m

    encoder = tnn.Module(); encoder.layers = tnn.ModuleList([enc_layer()])
    decoder = tnn.Module(); decoder.layers = tnn.ModuleList([dec_layer()])
    transformer = tnn.Module()
    transformer.encoder, transformer.decoder = encoder, decoder
    top = tnn.Module()
    top.transformer = transformer
    top.fc = tnn.Linear(in_dim, n_classes, bias=False)
    return top


def torch_forward_transsvnet(m, logits, long, len_q):
    """Literal reference forward (models_TCN.py:370-385)."""
    with torch.no_grad():
        out_features = torch.tensor(logits)           # (1, T, C) already
        C = out_features.size(2)
        wins = []
        for i in range(out_features.size(1)):
            if i < len_q - 1:
                w = torch.cat([torch.zeros(1, len_q - 1 - i, C),
                               out_features[:, : i + 1]], 1)
            else:
                w = out_features[:, i - len_q + 1 : i + 1]
            wins.append(w)
        inputs = torch.stack(wins, 0).squeeze(1)      # (T, len_q, C)
        feas = torch.tanh(m.fc(torch.tensor(long)).transpose(0, 1))  # (T, 1, C)
        enc = inputs
        for layer in m.transformer.encoder.layers:
            enc = layer.pos_ffn(layer.enc_self_attn(enc, enc, enc))
        dec = feas
        for layer in m.transformer.decoder.layers:
            dec = layer.pos_ffn(layer.dec_enc_attn(dec, enc, enc))
        return dec.numpy().reshape(1, -1, C)


def test_transsvnet_import_parity(tmp_path, rng):
    torch.manual_seed(2)
    F, C, LEN_Q, DIM, T = 8, 3, 5, 12, 33
    oracle = ref_style_transsvnet(F, C, DIM).eval()
    logits = rng.normal(size=(1, T, C)).astype(np.float32)
    long = rng.normal(size=(1, T, DIM)).astype(np.float32)
    want = torch_forward_transsvnet(oracle, logits, long, LEN_Q)

    path = str(tmp_path / "best_model_LOSO_1Out.pt")
    torch.save({"feature_extractor": None, "model": oracle.state_dict()}, path)
    imported = import_reference_checkpoint(path, "TransSVNet")

    model = TransSVNet(f_maps=F, out_classes=C, len_q=LEN_Q, in_dim=DIM)
    got = model.apply({"params": imported["params"]["model"]},
                      jnp.asarray(logits), jnp.asarray(long), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
