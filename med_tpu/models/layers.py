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


def _stacked_conv_kernel(key, shape, dtype=jnp.float32):
    """torch-default kernel init for a per-layer STACK of conv kernels.

    shape (L, K, I, O) (or (L, I, O) for 1x1): each layer iid
    U(±1/sqrt(K*I)) — the leading stack axis must not count toward fan_in,
    so :data:`torch_default_kernel` (flax variance_scaling) can't be reused.
    """
    fan_in = 1
    for s in shape[1:-1]:
        fan_in *= s
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ResidualStack(nn.Module):
    """``num_layers`` dilated temporal residual blocks (dilation 2^i) over
    (B, T, C): relu(dilated conv3) -> conv1x1 -> dropout(0.5) -> +residual
    per block (reference models_TCN.py:104-137; causal left-pad
    ``2*dilation`` matches the reference's pad-both-sides-then-trim).

    Params are stored STACKED per stage — ``w3`` (L, 3, C, C), ``b3`` (L, C),
    ``w1`` (L, C, C), ``b1`` (L, C) — the exact layout the fused Pallas
    kernel (:mod:`med_tpu.ops.tcn_fused`) consumes; torch per-layer
    checkpoints are stacked by the importers (utils/torch_port.py). Four
    leaves per stage instead of 4*L keeps the frame-family param tree small
    (~60 vs ~176 leaves): the per-step stack/unstack copies and the
    flattened optimizer's pack/unpack were a measurable latency tail on the
    one-trial-per-step TPU regime.

    ``fused``: "auto" (TPU only), True (force; interpret mode off-TPU — used
    by the CPU parity tests), or False. The fused path requires fp32 compute
    and B == 1 (the frame-family regime, reference modeling_utils.py:1464).
    """

    num_layers: int
    channels: int
    causal: bool = True
    dropout_rate: float = 0.5
    dtype: object = None
    fused: object = "auto"

    def setup(self):
        L, C = self.num_layers, self.channels
        self.w3 = self.param("w3", _stacked_conv_kernel, (L, 3, C, C))
        self.b3 = self.param("b3", torch_default_bias(3 * C), (L, C))
        self.w1 = self.param("w1", _stacked_conv_kernel, (L, C, C))
        self.b1 = self.param("b1", torch_default_bias(C), (L, C))

    def dropout_mask(self, B: int, T: int):
        """The per-layer Bernoulli keep-mask this stack would draw in
        ``__call__`` (same rng path/count, so the merged multi-stage kernel
        sees the identical stream). None when dropout is off.

        At the (reference-default) rate 0.5 each element needs exactly ONE
        random bit, so the mask is unpacked from 32x fewer threefry words:
        per-element ``bernoulli`` was ~130 us/step of the COG train step at
        T=1024 (threefry is ~10 VPU rounds per 32-bit word; the mask BYTES
        are trivial), the bit-unpack is a handful of fused passes. Unpack
        order runs along T (word t//32, bit t%32) — a different but equally
        i.i.d. stream; fused/unfused consistency is structural because both
        paths draw through this one method."""
        if self.dropout_rate <= 0.0:
            return None
        key = self.make_rng("dropout")
        shape = (self.num_layers, B, T, self.channels)
        if self.dropout_rate != 0.5:
            return jax.random.bernoulli(
                key, 1.0 - self.dropout_rate, shape).astype(jnp.uint8)
        L, C = self.num_layers, self.channels
        tw = (T + 31) // 32
        words = jax.random.bits(key, (L, B, tw, 1, C), jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32).reshape(1, 1, 1, 32, 1)
        bits = ((words >> shifts) & jnp.uint32(1)).astype(jnp.uint8)
        return bits.reshape(L, B, tw * 32, C)[:, :, :T]

    def weights(self):
        return self.w3, self.b3, self.w1, self.b1

    def __call__(self, x, train: bool = False):
        L = self.num_layers
        B, T, C = x.shape
        rate = self.dropout_rate
        mask = self.dropout_mask(B, T) if train else None

        use_fused = (self.fused is True) or (
            self.fused == "auto" and jax.default_backend() == "tpu"
        )
        # the kernel hardcodes the 1/keep = 2.0 dropout scale + fp32 compute
        use_fused = use_fused and (rate in (0.0, 0.5)) and self.dtype is None
        if use_fused and B == 1 and self.fused != True:  # noqa: E712
            # long trials fall back to the exact XLA loop: the fused
            # kernel's whole-sequence VMEM body has a measured T boundary
            # (forcing fused=True skips the gate — interpret-mode tests)
            from ..ops.tcn_fused import fused_stack_fits

            use_fused = fused_stack_fits(T, 2 ** L, mask is not None)
        if use_fused and B == 1:
            from ..ops.tcn_fused import dilated_residual_stack

            out = dilated_residual_stack(
                x[0], self.w3, self.b3, self.w1, self.b1, causal=self.causal,
                mask=mask[:, 0] if mask is not None else None,
            )
            return out[None]

        w3, b3, w1, b1 = self.w3, self.b3, self.w1, self.b1
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w3, b3, w1, b1 = (a.astype(self.dtype) for a in (w3, b3, w1, b1))
        keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
        for i in range(L):
            d = 2 ** i
            pad = (2 * d, 0) if self.causal else (d, d)
            xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
            y = sum(
                jnp.einsum("btc,co->bto", xp[:, j * d : j * d + T], w3[i, j])
                for j in range(3)
            ) + b3[i]
            y = jnp.einsum("btc,co->bto", nn.relu(y), w1[i]) + b1[i]
            if mask is not None:
                y = y * mask[i].astype(y.dtype) * keep
            x = x + y
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
        out = ResidualStack(
            self.num_layers, self.f_maps, causal=self.causal,
            dtype=self.dtype, fused=self.fused, name="stack",
        )(out, train)
        logits = Conv1d(self.out_classes, 1, dtype=self.dtype, name="conv_out")(out)
        # logits in fp32 for stable losses/softmax refinement
        return out, logits.astype(jnp.float32)
