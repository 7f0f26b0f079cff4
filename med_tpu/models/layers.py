"""Shared model building blocks.

Conventions (TPU-first, not the reference's):

- all sequence tensors are channel-last ``(B, T, F)`` so the feature axis is
  the TPU lane dimension; the reference's (B, F, T) permute dances
  (modeling_utils.py:47-75) do not exist here.
- modules take ``train: bool`` and draw dropout rngs from the ``'dropout'``
  rng stream; batch-norm statistics live in the ``'batch_stats'`` collection.

Weight initializers mirror the reference's torch inits:
- ``xavier_normal`` + bias 0.1 (FeatureExtractor / classifier heads,
  reference models.py:38-47),
- ``kaiming_normal`` fan-out (conv stacks, models.py:122-131),
- ``torch_default_*`` — torch's implicit kaiming-uniform(a=√5) scheme for
  layers the reference never re-initializes (all of models_TCN.py /
  models_COG.py).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# --- initializers ---------------------------------------------------------
xavier_normal = nn.initializers.glorot_normal()
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
kaiming_uniform_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
# torch's default Linear/Conv init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
torch_default_kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
bias_01 = nn.initializers.constant(0.1)
zeros = nn.initializers.zeros


def torch_default_bias(fan_in: int):
    """torch resets bias to U(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def mlp_head(
    x: jnp.ndarray,
    dims: Sequence[int],
    n_classes: int,
    train: bool,
    use_batchnorm: bool = True,
    name: str = "head",
) -> jnp.ndarray:
    """Dense -> ReLU -> (BatchNorm) stack ending in a linear classifier.

    Matches the classifier heads of the window models (reference
    models.py:102-111, :177-184): xavier-normal kernels.
    """
    for i, d in enumerate(dims):
        x = nn.Dense(d, kernel_init=xavier_normal, name=f"{name}_dense{i}")(x)
        x = nn.relu(x)
        if use_batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"{name}_bn{i}"
            )(x)
    return nn.Dense(n_classes, kernel_init=xavier_normal, name=f"{name}_out")(x)


class _TapConv(nn.Module):
    """k-tap 1-D conv as k shifted (T, C)@(C, O) matmuls.

    On TPU the temporal convs here are tiny ((1, T, 64) activations), where
    XLA's convolution lowering is slower than feeding the MXU directly; the
    tap formulation is mathematically identical. Params match ``nn.Conv``
    exactly — kernel (K, I, O) + bias (O,) — so checkpoints and the torch
    importers are unaffected.
    """

    features: int
    kernel_size: int
    dilation: int
    pad: tuple  # (left, right)
    use_bias: bool
    kernel_init: object
    bias_init: object
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        kernel = self.param(
            "kernel", self.kernel_init, (k, x.shape[-1], self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        left, right = self.pad
        if left or right:
            x = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        t_out = x.shape[1] - d * (k - 1)
        y = jnp.einsum("btc,co->bto", x[:, :t_out], kernel[0])
        for j in range(1, k):
            y = y + jnp.einsum(
                "btc,co->bto", x[:, j * d : j * d + t_out], kernel[j]
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class Conv1d(nn.Module):
    """1-D convolution on (B, T, C) with torch-default init, lowered to
    shifted matmuls (see :class:`_TapConv`)."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    padding: object = "VALID"  # 'VALID' | 'SAME' | [(left, right)]
    use_bias: bool = True
    kernel_init: object = None
    dtype: object = None       # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size
        if self.padding == "VALID":
            pad = (0, 0)
        elif self.padding == "SAME":
            total = self.dilation * (self.kernel_size - 1)
            pad = (total // 2, total - total // 2)
        else:
            pad = tuple(self.padding[0])
        return _TapConv(
            self.features,
            self.kernel_size,
            self.dilation,
            pad,
            self.use_bias,
            self.kernel_init or torch_default_kernel,
            torch_default_bias(fan_in),
            self.dtype,
            name="Conv_0",
        )(x)


class _TapConvParams(nn.Module):
    """Param holder + compute for one conv inside a residual block.

    setup-style twin of :class:`_TapConv` with identical param names/shapes
    (``kernel`` (K, I, O), ``bias`` (O,)) so checkpoints and the torch
    importers are unaffected — but the params are *declared in setup*, which
    lets a parent stack them for the fused Pallas kernel without calling the
    layer (linen materializes setup params on attribute access).
    """

    features: int
    in_features: int
    kernel_size: int

    def setup(self):
        fan_in = self.in_features * self.kernel_size
        self.kernel = self.param(
            "kernel", torch_default_kernel,
            (self.kernel_size, self.in_features, self.features),
        )
        self.bias = self.param("bias", torch_default_bias(fan_in), (self.features,))

    def __call__(self, x, dilation: int, pad: Tuple[int, int], dtype=None):
        kernel, bias = self.kernel, self.bias
        if dtype is not None:
            x = x.astype(dtype)
            kernel = kernel.astype(dtype)
            bias = bias.astype(dtype)
        left, right = pad
        if left or right:
            x = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        k, d = self.kernel_size, dilation
        t_out = x.shape[1] - d * (k - 1)
        y = jnp.einsum("btc,co->bto", x[:, :t_out], kernel[0])
        for j in range(1, k):
            y = y + jnp.einsum(
                "btc,co->bto", x[:, j * d : j * d + t_out], kernel[j]
            )
        return y + bias


class _ConvScope(nn.Module):
    """Preserves the historical ``<name>/Conv_0/{kernel,bias}`` param path
    of :class:`Conv1d` while exposing the params for stacking."""

    features: int
    in_features: int
    kernel_size: int

    def setup(self):
        self.tap = _TapConvParams(
            self.features, self.in_features, self.kernel_size, name="Conv_0"
        )

    def __call__(self, x, dilation: int, pad: Tuple[int, int], dtype=None):
        return self.tap(x, dilation, pad, dtype)


class DilatedResidualLayer(nn.Module):
    """Dilated temporal residual block (reference models_TCN.py:104-137).

    causal: left-pad ``2*dilation`` (the reference pads both sides and trims
    the right tail — equivalent); otherwise symmetric ``dilation`` padding.
    relu(dilated conv3) -> conv1 -> dropout(0.5) -> +residual.

    setup-style so :func:`run_residual_stack` can read the conv params
    without executing the layer (fused Pallas path).
    """

    channels: int
    dilation: int
    causal: bool = True
    dropout_rate: float = 0.5
    dtype: object = None

    def setup(self):
        self.conv_dilated = _ConvScope(
            self.channels, self.channels, 3, name="conv_dilated"
        )
        self.conv_1x1 = _ConvScope(self.channels, self.channels, 1, name="conv_1x1")
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, train: bool = False):
        pad = (
            (2 * self.dilation, 0)
            if self.causal
            else (self.dilation, self.dilation)
        )
        out = self.conv_dilated(x, self.dilation, pad, self.dtype)
        out = nn.relu(out)
        out = self.conv_1x1(out, 1, (0, 0), self.dtype)
        out = self.drop(out, deterministic=not train)
        return x + out


def run_residual_stack(parent: nn.Module, layers, x, train: bool,
                       causal: bool, fused) -> jnp.ndarray:
    """Run a list of :class:`DilatedResidualLayer` (dilations 2^i) over
    ``x`` (B, T, C) — fused into one Pallas kernel per direction on TPU
    (:mod:`med_tpu.ops.tcn_fused`), per-layer modules otherwise.

    ``fused``: "auto" (TPU only), True (force; interpret mode off-TPU — used
    by the CPU parity tests), or False. The fused path requires fp32 compute
    and B == 1 (the frame-family regime, reference modeling_utils.py:1464).
    """
    use_fused = (fused is True) or (
        fused == "auto" and jax.default_backend() == "tpu"
    )
    rate = layers[0].dropout_rate
    # the kernel hardcodes the 1/keep = 2.0 dropout scale and fp32 compute
    use_fused = use_fused and (rate in (0.0, 0.5)) and layers[0].dtype is None
    if use_fused and x.shape[0] == 1:
        from ..ops.tcn_fused import dilated_residual_stack

        w3 = jnp.stack([l.conv_dilated.tap.kernel for l in layers])
        b3 = jnp.stack([l.conv_dilated.tap.bias for l in layers])
        w1 = jnp.stack([l.conv_1x1.tap.kernel[0] for l in layers])
        b1 = jnp.stack([l.conv_1x1.tap.bias for l in layers])
        mask = None
        if train and rate > 0.0:
            L = len(layers)
            T, C = x.shape[1], x.shape[2]
            mask = jax.random.bernoulli(
                parent.make_rng("dropout"), 1.0 - rate, (L, T, C)
            ).astype(jnp.uint8)
        out = dilated_residual_stack(
            x[0], w3, b3, w1, b1, causal=causal, mask=mask
        )
        return out[None]
    for l in layers:
        x = l(x, train)
    return x


class SingleStageTCN(nn.Module):
    """One MS-TCN stage (reference models_TCN.py:76-101 / :140-165).

    conv1x1 in -> num_layers dilated residual blocks (dilation 2^i) ->
    conv1x1 out. Returns (features, logits); callers needing only logits
    drop the features.
    """

    num_layers: int
    f_maps: int
    out_classes: int
    causal: bool = True
    dtype: object = None
    fused: object = "auto"   # fused Pallas stack: "auto" (TPU) | True | False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = Conv1d(self.f_maps, 1, dtype=self.dtype, name="conv_in")(x)
        layers = [
            DilatedResidualLayer(
                self.f_maps, 2**i, causal=self.causal, dtype=self.dtype,
                name=f"layer{i}"
            )
            for i in range(self.num_layers)
        ]
        out = run_residual_stack(self, layers, out, train, self.causal, self.fused)
        logits = Conv1d(self.out_classes, 1, dtype=self.dtype, name="conv_out")(out)
        # logits in fp32 for stable losses/softmax refinement
        return out, logits.astype(jnp.float32)
