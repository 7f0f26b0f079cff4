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
import jax
import jax.numpy as jnp

from .layers import kaiming_normal_fan_out


class SubsampledBatchNorm(nn.Module):
    """BatchNorm whose TRAIN-mode statistics are estimated on the first
    ``B / stat_stride`` images of the batch ("ghost batch" statistics)
    instead of the complete (B, H, W) reduction; normalization still covers
    every element.

    Motivation (round-4 trace, CLAUDE.md): the fine-tune step's remaining
    wall is ~5 ms of BN stat/grad reductions over 53 layers' activations at
    HBM bandwidth — the stat pass re-reads every activation the conv just
    wrote. A batch-prefix subsample cuts that read by ``stat_stride``x and
    is unbiased under shuffled batches. The subsample MUST be a contiguous
    leading slice: a strided row gather (``x[:, ::4]``) was measured at
    15.25 ms/step vs the 12.73 exact-BN step — TPU lowers the strided
    slice to relayout copies (9.5 ms of copy-start) that dwarf the saved
    stat pass. It is a DOCUMENTED DEVIATION from exact train-mode BN
    (estimator noise on mean/var; running stats track the same quantity in
    expectation) and is OFF by default (stride 1 = exact BatchNorm
    semantics, equality pinned in tests/test_resnet_bn.py); opt in via the
    driver's ``--bn-stat-stride``. Parameter/variable tree matches
    nn.BatchNorm (params scale/bias, batch_stats mean/var), so checkpoints
    and the torchvision importer are unaffected.
    """

    stat_stride: int = 4
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            sub = (x[: max(1, x.shape[0] // self.stat_stride)]
                   if x.ndim == 4 else x)
            sub = sub.astype(jnp.float32)
            mean = jnp.mean(sub, axis=tuple(range(sub.ndim - 1)))
            # biased variance, like flax nn.BatchNorm
            var = jnp.mean(
                jnp.square(sub), axis=tuple(range(sub.ndim - 1))
            ) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        return ((x.astype(self.dtype) - mean.astype(self.dtype)) * inv
                + bias.astype(self.dtype))


class Bottleneck(nn.Module):
    features: int           # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32   # compute dtype (params stay fp32)
    bn_stat_stride: int = 1    # >1: SubsampledBatchNorm ghost stats

    def _bn(self, name: str, train: bool):
        if self.bn_stat_stride > 1:
            return SubsampledBatchNorm(
                stat_stride=self.bn_stat_stride,
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name=name)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_kw = dict(use_bias=False, kernel_init=kaiming_normal_fan_out,
                       dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), name="conv1", **conv_kw)(x)
        y = self._bn("bn1", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], name="conv2", **conv_kw)(y)
        y = self._bn("bn2", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), name="conv3", **conv_kw)(y)
        y = self._bn("bn3", train)(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                name="down_conv", **conv_kw,
            )(x)
            residual = self._bn("down_bn", train)(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Feature trunk: (B, H, W, 3) -> (B, 2048) pooled features."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32   # bfloat16 for the fast serving path
    bn_stat_stride: int = 1    # >1: ghost-stat BN (SubsampledBatchNorm)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
                    name="conv1")(x)
        if self.bn_stat_stride > 1:
            y = SubsampledBatchNorm(
                stat_stride=self.bn_stat_stride,
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name="bn1")(y)
        else:
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
                    bn_stat_stride=self.bn_stat_stride,
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
    bn_stat_stride: int = 1

    def setup(self):
        self.trunk = ResNet50(self.stage_sizes, self.width, self.dtype,
                              bn_stat_stride=self.bn_stat_stride)
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
