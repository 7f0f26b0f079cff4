"""Reference-checkpoint interop: import torch state_dicts into our params.

The reference saves ``{'feature_extractor': state_dict, 'model':
state_dict}`` per fold (modeling_utils.py:3028-3040). These importers map
those state_dicts onto the Flax parameter trees so recorded reference
weights can drive the logit-parity harness (SURVEY.md §7 "use imported
reference checkpoints for the logit-parity harness").

Key-name contracts (from the reference module definitions):
- FeatureExtractor: ``linear.linear_{i}.weight/bias``, ``linear.output.*``
  (models.py:19-31);
- CNN: ``convolutional_layers.{k}.*`` (Conv1d / BatchNorm1d interleaved),
  ``linear_layers.{k}.*`` (models.py:66-111);
- LSTM: ``lstm.weight_ih_l{k}`` / ``weight_hh_l{k}`` / biases,
  ``linear_layers.{k}.*`` (models.py:161-184).

Layout conversions: Linear (O, I) -> (I, O); Conv1d (O, I, K) -> (K, I, O);
LSTM gates torch [i, f, g, o] blocks -> flax per-gate kernels; the first
dense after a conv flatten is re-ordered channel-major -> time-major.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _n(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _dense(sd, prefix):
    p = {"kernel": _n(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        p["bias"] = _n(sd[prefix + ".bias"])
    return p


def _conv1d(sd, prefix):
    return {
        "kernel": _n(sd[prefix + ".weight"]).transpose(2, 1, 0),
        "bias": _n(sd[prefix + ".bias"]),
    }


def _bn(sd, prefix):
    return (
        {"scale": _n(sd[prefix + ".weight"]), "bias": _n(sd[prefix + ".bias"])},
        {"mean": _n(sd[prefix + ".running_mean"]),
         "var": _n(sd[prefix + ".running_var"])},
    )


def import_feature_extractor(sd: Dict[str, Any]) -> dict:
    """FeatureExtractor state_dict -> flax params (dense0, dense1, out)."""
    params = {}
    hidden = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"linear\.linear_(\d+)\.weight", k))
    )
    for i in hidden:
        params[f"dense{i}"] = _dense(sd, f"linear.linear_{i}")
    params["out"] = _dense(sd, "linear.output")
    return params


def _sequential_indices(sd: Dict[str, Any], prefix: str):
    """(index, kind) pairs for a torch Sequential: kind in conv/linear/bn."""
    out = {}
    for k in sd:
        m = re.fullmatch(rf"{prefix}\.(\d+)\.weight", k)
        if not m:
            continue
        i = int(m.group(1))
        w = _n(sd[k])
        if f"{prefix}.{i}.running_mean" in sd:
            out[i] = "bn"
        elif w.ndim == 3:
            out[i] = "conv"
        elif w.ndim == 2:
            out[i] = "linear"
    return [out[i] for i in sorted(out)], sorted(out)


def import_window_cnn(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Reference CNN state_dict -> (params, batch_stats) for WindowCNN."""
    params: Dict[str, Any] = {"head": {}}
    stats: Dict[str, Any] = {"head": {}}

    kinds, idxs = _sequential_indices(sd, "convolutional_layers")
    conv_i = bn_i = 0
    last_conv_channels = None
    for kind, i in zip(kinds, idxs):
        if kind == "conv":
            params[f"conv{conv_i}"] = _conv1d(sd, f"convolutional_layers.{i}")
            last_conv_channels = params[f"conv{conv_i}"]["kernel"].shape[-1]
            conv_i += 1
        else:
            params[f"bn{bn_i}"], stats[f"bn{bn_i}"] = _bn(
                sd, f"convolutional_layers.{i}"
            )
            bn_i += 1

    kinds, idxs = _sequential_indices(sd, "linear_layers")
    dense_i = bn_i = 0
    first_dense = True
    n_linear = sum(1 for k in kinds if k == "linear")
    for kind, i in zip(kinds, idxs):
        if kind == "linear":
            p = _dense(sd, f"linear_layers.{i}")
            if first_dense and last_conv_channels:
                # torch flattened (C, L) channel-major; ours is (L, C)
                w = _n(sd[f"linear_layers.{i}.weight"])  # (out, C*L)
                C = last_conv_channels
                L = w.shape[1] // C
                p["kernel"] = (
                    w.reshape(w.shape[0], C, L).transpose(2, 1, 0).reshape(
                        L * C, w.shape[0]
                    )
                )
                first_dense = False
            name = "out" if dense_i == n_linear - 1 else f"dense{dense_i}"
            params["head"][name] = p
            dense_i += 1
        else:
            params["head"][f"bn{bn_i}"], stats["head"][f"bn{bn_i}"] = _bn(
                sd, f"linear_layers.{i}"
            )
            bn_i += 1
    return params, stats


def import_window_lstm(sd: Dict[str, Any], hidden_size: int = 128) -> Tuple[dict, dict]:
    """Reference LSTM state_dict -> (params, batch_stats) for WindowLSTM."""
    params: Dict[str, Any] = {"head": {}}
    stats: Dict[str, Any] = {"head": {}}
    H = hidden_size
    layer = 0
    while f"lstm.weight_ih_l{layer}" in sd:
        w_ih = _n(sd[f"lstm.weight_ih_l{layer}"])
        w_hh = _n(sd[f"lstm.weight_hh_l{layer}"])
        b = _n(sd[f"lstm.bias_ih_l{layer}"]) + _n(sd[f"lstm.bias_hh_l{layer}"])
        cell = {}
        for gi, g in enumerate("ifgo"):
            sl = slice(gi * H, (gi + 1) * H)
            cell[f"i{g}"] = {"kernel": w_ih[sl].T}
            cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        params[f"lstm{layer}"] = {"cell": cell}
        layer += 1

    kinds, idxs = _sequential_indices(sd, "linear_layers")
    dense_i = bn_i = 0
    n_linear = sum(1 for k in kinds if k == "linear")
    for kind, i in zip(kinds, idxs):
        if kind == "linear":
            name = "out" if dense_i == n_linear - 1 else f"dense{dense_i}"
            params["head"][name] = _dense(sd, f"linear_layers.{i}")
            dense_i += 1
        else:
            params["head"][f"bn{bn_i}"], stats["head"][f"bn{bn_i}"] = _bn(
                sd, f"linear_layers.{i}"
            )
            bn_i += 1
    return params, stats


def import_reference_checkpoint(path: str, model_name: str,
                                hidden_size: int = 128) -> dict:
    """Load a reference ``best_model_*.pt`` into our nested param layout
    ({'params': {'fe': …, 'model': …}, 'batch_stats': {'model': …}})."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    if blob.get("feature_extractor"):
        out["params"]["fe"] = import_feature_extractor(blob["feature_extractor"])
    sd = blob["model"]
    if model_name in ("SimpleCNN", "Siamese_CNN"):
        p, s = import_window_cnn(sd)
    elif model_name in ("SimpleLSTM", "Siamese_LSTM"):
        p, s = import_window_lstm(sd, hidden_size)
    else:
        raise NotImplementedError(
            f"reference import for {model_name} not implemented yet"
        )
    out["params"]["model"] = p
    out["batch_stats"]["model"] = s
    return out
