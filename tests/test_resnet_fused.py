"""VMEM-fused ResNet bottleneck-stage inference (ops/resnet_fused.py):
numerical parity with the Flax trunk in f32 interpret mode.

The fused path reproduces the serving trunk of the reference pipeline
(preprocessing_utils.py:722-823 runs torchvision resnet50 over frames); on
hardware it measured a tie with XLA's conv path (see the module docstring),
so it is NOT wired into the default e2e graph — this test pins that the
kernel math (BN folding, shifted-row 3x3 taps, edge masks, residuals)
stays exact should it be revisited.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from med_tpu.models.resnet import ResNet50
from med_tpu.ops.resnet_fused import (
    fold_bottleneck_params,
    fused_bottleneck_stage,
    resnet50_fused_apply,
)


@pytest.fixture(scope="module")
def small_trunk():
    trunk = ResNet50(stage_sizes=(2, 2, 1, 1), width=8)
    variables = jax.jit(
        lambda: trunk.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False))()
    return trunk, variables


def test_fused_stage_matches_xla_blocks(small_trunk, rng):
    """One fused stage (stride-1 blocks incl. the stage-1 projection head)
    equals the Flax block stack in f32."""
    trunk, variables = small_trunk
    p, s = variables["params"], variables["batch_stats"]
    B, H, W, C = 2, 16, 16, 8
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

    # stage 1 = layer1_0 (with stride-1 projection) + layer1_1
    blocks = [fold_bottleneck_params(p[f"layer1_{b}"], s[f"layer1_{b}"])
              for b in range(2)]
    got = fused_bottleneck_stage(x.reshape(B, H * W, C), blocks, Wr=W,
                                 dtype=jnp.float32, interpret=True)
    got = np.asarray(got).reshape(B, H, W, -1)

    ref = _blocks_oracle(variables, x, "layer1", range(2))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


def _blocks_oracle(variables, x, layer, idxs):
    """Literal f32 NumPy bottleneck blocks (torchvision v1.5 graph,
    models/resnet.py:31-53) as the parity oracle."""
    p, s = variables["params"], variables["batch_stats"]

    def conv(z, kern, stride):
        pad = (kern.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            z, kern, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn(z, bp, bs):
        a = bp["scale"] / jnp.sqrt(bs["var"] + 1e-5)
        return z * a + (bp["bias"] - bs["mean"] * a)

    y = jnp.asarray(x, jnp.float32)
    for b in idxs:
        bp, bs = p[f"{layer}_{b}"], s[f"{layer}_{b}"]
        h = jax.nn.relu(bn(conv(y, bp["conv1"]["kernel"], 1), bp["bn1"],
                           bs["bn1"]))
        h = jax.nn.relu(bn(conv(h, bp["conv2"]["kernel"], 1), bp["bn2"],
                           bs["bn2"]))
        h = bn(conv(h, bp["conv3"]["kernel"], 1), bp["bn3"], bs["bn3"])
        if "down_conv" in bp:
            res = bn(conv(y, bp["down_conv"]["kernel"], 1), bp["down_bn"],
                     bs["down_bn"])
        else:
            res = y
        y = jax.nn.relu(h + res)
    return np.asarray(y)


def test_fused_apply_matches_flax_trunk(small_trunk, rng):
    """Full fused-apply (stem + stride-2 XLA blocks + fused stages) equals
    the Flax trunk forward in f32."""
    trunk, variables = small_trunk
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(trunk.apply(variables, x, train=False), np.float32)
    got = np.asarray(
        resnet50_fused_apply(variables, x, stage_sizes=(2, 2, 1, 1),
                             dtype=jnp.float32, fused_stages=(0, 1),
                             interpret=True), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel
