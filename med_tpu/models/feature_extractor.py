"""Video feature compressor: MLP 2048 -> 512 -> 256 -> video_dims.

Reference ``FeatureExtractor`` (models.py:6-47): xavier-normal kernels,
all biases 0.1, ReLU between layers, trained jointly with the downstream
classifier under a single optimizer (modeling_utils.py:220-222).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .layers import bias_01, xavier_normal


class FeatureExtractor(nn.Module):
    output_dim: int = 32
    hidden_dims: Sequence[int] = (512, 256)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.hidden_dims):
            x = nn.Dense(
                d, kernel_init=xavier_normal, bias_init=bias_01, name=f"dense{i}"
            )(x)
            x = nn.relu(x)
        return nn.Dense(
            self.output_dim, kernel_init=xavier_normal, bias_init=bias_01, name="out"
        )(x)
