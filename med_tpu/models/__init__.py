"""Model zoo + factory (reference ``instantiate_model``,
modeling_utils.py:3043-3117)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import ExperimentConfig
from .feature_extractor import FeatureExtractor  # noqa: F401
from .window_models import (  # noqa: F401
    SiameseCNN,
    SiameseLSTM,
    WindowCNN,
    WindowLSTM,
)
from .tcn import TeCNo  # noqa: F401
from .transsvnet import TransSVNet  # noqa: F401
from .cog import COG  # noqa: F401


def build_model(cfg: ExperimentConfig, prompt_path: Optional[str] = None):
    """Construct the configured model (flax module, uninitialized)."""
    name = cfg.model_name
    in_features = cfg.in_features()
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    if name == "SimpleCNN":
        return WindowCNN(
            in_features=in_features,
            window_size=cfg.window_size,
            n_classes=cfg.out_features,
        )
    if name == "SimpleLSTM":
        return WindowLSTM(
            in_features=in_features,
            window_size=cfg.window_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            n_classes=cfg.out_features,
        )
    if name == "Siamese_CNN":
        return SiameseCNN(in_features=in_features, window_size=cfg.window_size)
    if name == "Siamese_LSTM":
        return SiameseLSTM(in_features=in_features, window_size=cfg.window_size)
    if name == "TeCNo":
        return TeCNo(
            num_stages=cfg.mstcn_stages,
            num_layers=cfg.mstcn_layers,
            f_maps=cfg.mstcn_f_maps,
            in_dim=in_features,
            out_classes=cfg.out_features,
            causal=cfg.mstcn_causal_conv,
            dtype=dtype,
            fused="auto" if cfg.use_pallas else False,
        )
    if name == "TransSVNet":
        return TransSVNet(
            f_maps=cfg.mstcn_f_maps,
            out_classes=cfg.out_features,
            len_q=cfg.sequence_length,
            in_dim=in_features,
        )
    if name == "COG":
        return COG(
            num_layers_basic=cfg.num_layers_Basic,
            num_layers_r=cfg.num_layers_R,
            num_r=cfg.num_R,
            f_maps=cfg.mstcn_f_maps,
            f_dim=in_features,
            out_classes=cfg.out_features,
            causal=cfg.mstcn_causal_conv,
            d_model=cfg.d_model,
            d_q=cfg.d_q,
            len_q=cfg.sequence_length,
            use_pallas=cfg.use_pallas,
            prompt_path=prompt_path,
            use_all_gestures=cfg.use_all_gestures,
            use_skill_prompt=cfg.use_skill_prompt,
            srm=cfg.SRM,
            dtype=dtype,
            fused="auto" if cfg.use_pallas else False,
        )
    raise ValueError(f"model {name!r} is not supported")


def build_feature_extractor(cfg: ExperimentConfig) -> Optional[FeatureExtractor]:
    """The jointly-trained 2048->video_dims MLP, when the config uses one
    (reference modeling_utils.py:218-228)."""
    if not cfg.uses_feature_extractor():
        return None
    return FeatureExtractor(output_dim=cfg.video_dims)
