"""Window-level classifiers: 1-D CNN, LSTM, and their siamese twins.

Reference ``MED/modeling/models.py``. Inputs are (B, W, F) channel-last
windows (the reference feeds (B, F, W) and the LSTM transposes back —
models.py:191; here everything stays time-major/feature-last).

Modules are written in ``setup()`` style so the siamese twins can reuse a
branch's ``features``/``classify`` methods with shared weights
(reference models.py:238-240, :278-280).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import kaiming_normal_fan_out, torch_default_bias, xavier_normal


def torch_lstm_init(hidden_size: int):
    """torch LSTM initializes every weight/bias U(±1/sqrt(hidden))."""
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Head(nn.Module):
    """Dense -> ReLU -> BatchNorm stack + linear classifier (reference
    models.py:102-111, :177-184)."""

    dims: Sequence[int]
    n_classes: int

    def setup(self):
        self.denses = [
            nn.Dense(d, kernel_init=xavier_normal, name=f"dense{i}")
            for i, d in enumerate(self.dims)
        ]
        self.bns = [
            nn.BatchNorm(momentum=0.9, name=f"bn{i}") for i in range(len(self.dims))
        ]
        self.out = nn.Dense(self.n_classes, kernel_init=xavier_normal)

    def __call__(self, x, train: bool = False):
        for dense, bn in zip(self.denses, self.bns):
            x = nn.relu(dense(x))
            x = bn(x, use_running_average=not train)
        return self.out(x)


class WindowCNN(nn.Module):
    """2-or-3 block Conv1d stack + MLP head (reference models.py:49-131).

    Block: conv(k=3, valid) -> maxpool(2,2) -> dropout(0.2) -> batchnorm.
    Channels (64, 128) for window 10, (64, 128, 256) for window 30; the
    flattened conv output feeds Dense 256-32-16-n_classes with ReLU+BN.
    """

    in_features: int = 58
    window_size: int = 10
    n_classes: int = 1

    @property
    def channels(self) -> Tuple[int, ...]:
        return (64, 128) if self.window_size == 10 else (64, 128, 256)

    def setup(self):
        fan = [self.in_features] + list(self.channels)
        self.convs = [
            nn.Conv(
                ch,
                (3,),
                padding="VALID",
                kernel_init=kaiming_normal_fan_out,
                bias_init=torch_default_bias(fan[i] * 3),
                name=f"conv{i}",
            )
            for i, ch in enumerate(self.channels)
        ]
        self.conv_bns = [
            nn.BatchNorm(momentum=0.9, name=f"bn{i}")
            for i in range(len(self.channels))
        ]
        self.drop = nn.Dropout(0.2)
        self.head = _Head((256, 32, 16), self.n_classes)

    def features(self, x, train: bool = False):
        """Flattened conv-stack output (the siamese branch embedding)."""
        for conv, bn in zip(self.convs, self.conv_bns):
            x = conv(x)
            x = nn.max_pool(x, (2,), strides=(2,))
            x = self.drop(x, deterministic=not train)
            x = bn(x, use_running_average=not train)
        return x.reshape(x.shape[0], -1)

    def classify(self, f, train: bool = False):
        return self.head(f, train)

    def __call__(self, x, train: bool = False):
        return self.classify(self.features(x, train), train)


class WindowLSTM(nn.Module):
    """3-layer LSTM + MLP head (reference models.py:135-220).

    Stacked LSTM (hidden 128, inter-layer dropout 0.2) over the window as a
    ``lax.scan`` (flax RNN), ReLU on the outputs, last time step into
    Dense 256-64-n_classes with ReLU+BN.
    """

    in_features: int = 58
    window_size: int = 10
    hidden_size: int = 128
    num_layers: int = 3
    n_classes: int = 1

    def setup(self):
        init = torch_lstm_init(self.hidden_size)
        self.rnns = [
            nn.RNN(
                nn.OptimizedLSTMCell(
                    self.hidden_size,
                    kernel_init=init,
                    recurrent_kernel_init=init,
                    bias_init=init,
                ),
                name=f"lstm{layer}",
            )
            for layer in range(self.num_layers)
        ]
        self.drop = nn.Dropout(0.2)
        self.head = _Head((256, 64), self.n_classes)

    def features(self, x, train: bool = False):
        """ReLU'd last-time-step hidden state (the siamese branch)."""
        for layer, rnn in enumerate(self.rnns):
            x = rnn(x)
            if layer < self.num_layers - 1:
                x = self.drop(x, deterministic=not train)
        x = nn.relu(x)
        return x[:, -1, :]

    def classify(self, f, train: bool = False):
        return self.head(f, train)

    def __call__(self, x, train: bool = False):
        return self.classify(self.features(x, train), train)


class SiameseCNN(nn.Module):
    """Shared-weight CNN twins; |f1 - f2| -> shared MLP head -> similarity
    logit (reference models.py:223-261)."""

    in_features: int = 58
    window_size: int = 10

    def setup(self):
        self.branch = WindowCNN(
            in_features=self.in_features, window_size=self.window_size, n_classes=1
        )

    def __call__(self, x1, x2, train: bool = False):
        f1 = self.branch.features(x1, train)
        f2 = self.branch.features(x2, train)
        return self.branch.classify(jnp.abs(f1 - f2), train)


class SiameseLSTM(nn.Module):
    """Shared-weight LSTM twins (reference models.py:264-312)."""

    in_features: int = 58
    window_size: int = 10

    def setup(self):
        self.branch = WindowLSTM(
            in_features=self.in_features, window_size=self.window_size, n_classes=1
        )

    def __call__(self, x1, x2, train: bool = False):
        f1 = self.branch.features(x1, train)
        f2 = self.branch.features(x2, train)
        return self.branch.classify(jnp.abs(f1 - f2), train)
