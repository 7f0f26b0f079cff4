"""ResNet-50 backbone for raw-frame fine-tuning and feature export.

The reference fine-tunes torchvision's ImageNet resnet50 with a
2048->512->1 binary-error head per fold, then swaps the head for Identity to
emit the 2048-d per-frame features every other model consumes
(notebooks/resnet_finetuning.ipynb cells 3-9; preprocessing_utils.py:722-823).

This is a from-scratch NHWC Flax ResNet-v1.5 (stride-2 in the 3x3 conv,
torchvision's layout) sized by the standard (3,4,6,3) bottleneck stages, with
an importer for torchvision state_dicts so ImageNet (or reference-finetuned)
weights can be loaded when available — offline surrogate otherwise is
train-from-scratch init.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import kaiming_normal_fan_out


class Bottleneck(nn.Module):
    features: int           # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32   # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_kw = dict(use_bias=False, kernel_init=kaiming_normal_fan_out,
                       dtype=self.dtype)
        bn_kw = dict(use_running_average=not train, momentum=0.9,
                     dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), name="conv1", **conv_kw)(x)
        y = nn.BatchNorm(name="bn1", **bn_kw)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], name="conv2", **conv_kw)(y)
        y = nn.BatchNorm(name="bn2", **bn_kw)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), name="conv3", **conv_kw)(y)
        y = nn.BatchNorm(name="bn3", **bn_kw)(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                name="down_conv", **conv_kw,
            )(x)
            residual = nn.BatchNorm(name="down_bn", **bn_kw)(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Feature trunk: (B, H, W, 3) -> (B, 2048) pooled features."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32   # bfloat16 for the fast serving path

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2**stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                y = Bottleneck(
                    features, stride=stride,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(y, train)
        # pool in fp32 for a stable feature scale
        return jnp.mean(y.astype(jnp.float32), axis=(1, 2))


class ResNetClassifier(nn.Module):
    """Trunk + the reference's fine-tuning head fc: 2048 -> 512 -> 1
    (resnet_finetuning.ipynb cell 7)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    n_classes: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk = ResNet50(self.stage_sizes, self.width, self.dtype)
        self.fc1 = nn.Dense(512)
        self.fc2 = nn.Dense(self.n_classes)

    def features(self, x, train: bool = False):
        return self.trunk(x, train)

    def __call__(self, x, train: bool = False):
        f = self.trunk(x, train)
        return self.fc2(nn.relu(self.fc1(f)))


# ------------------------------------------------------------- torch import
def import_torchvision_resnet50(state_dict: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision resnet50 state_dict (tensors or numpy) -> (params,
    batch_stats) for :class:`ResNet50`. The fc layer is ignored (the trunk
    ends at the global pool, like the reference's fc->Identity swap)."""
    import numpy as np

    def n(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(src):
        return {"kernel": n(state_dict[src + ".weight"]).transpose(2, 3, 1, 0)}

    def bn(src):
        return (
            {"scale": n(state_dict[src + ".weight"]),
             "bias": n(state_dict[src + ".bias"])},
            {"mean": n(state_dict[src + ".running_mean"]),
             "var": n(state_dict[src + ".running_var"])},
        )

    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    stage_sizes = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            src = f"layer{stage + 1}.{block}"
            dst = f"layer{stage + 1}_{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = conv(f"{src}.conv{i}")
                p[f"bn{i}"], s[f"bn{i}"] = bn(f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in state_dict:
                p["down_conv"] = conv(f"{src}.downsample.0")
                p["down_bn"], s["down_bn"] = bn(f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s
    return params, stats


def load_pretrained_trunk(path: str) -> Tuple[dict, dict]:
    """Load ImageNet (or any torchvision-format) resnet50 weights from a
    torch ``.pth``/``.pt`` blob or an ``.npz`` of the same key layout and
    return (params, batch_stats) for :class:`ResNet50`. This is the
    fine-tune driver's pretrained start (the reference begins from
    ``torchvision.models.resnet50(pretrained=True)``,
    notebooks/resnet_finetuning.ipynb cell 7)."""
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return import_torchvision_resnet50(sd)
