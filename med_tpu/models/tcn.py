"""TeCNo: multi-stage temporal convolutional network (frame level).

Reference ``MultiStageModel`` (models_TCN.py:17-101): stage 1 maps the
feature stream to class logits through num_layers dilated residual blocks;
each later stage refines the softmax of the previous stage's logits.
Returns all stage logits stacked (S, B, T, C) — the loss averages CE across
stages (modeling_utils.py:278-297).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import SingleStageTCN


class TeCNo(nn.Module):
    num_stages: int = 2
    num_layers: int = 8
    f_maps: int = 64
    in_dim: int = 2048
    out_classes: int = 2
    causal: bool = True
    dtype: object = None      # bfloat16 compute (params stay fp32)
    fused: object = "auto"    # fused Pallas TCN stacks: "auto" (TPU) | True | False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, in_dim) -> (num_stages, B, T, out_classes)."""
        _, logits = SingleStageTCN(
            self.num_layers, self.f_maps, self.out_classes, self.causal,
            dtype=self.dtype, fused=self.fused, name="stage0"
        )(x, train)
        outputs = [logits]
        for s in range(1, self.num_stages):
            _, logits = SingleStageTCN(
                self.num_layers,
                self.f_maps,
                self.out_classes,
                self.causal,
                dtype=self.dtype,
                fused=self.fused,
                name=f"stage{s}",
            )(nn.softmax(logits, axis=-1), train)
            outputs.append(logits)
        return jnp.stack(outputs, axis=0)
