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
