"""SubsampledBatchNorm (ghost-batch-stat BN knob, round-4 VERDICT item 6).

stride 1 must equal flax nn.BatchNorm exactly (output + updated running
stats); stride > 1 must normalize with statistics of the first B/stride
images (a contiguous slice — strided gathers relayout-copy on TPU) and
keep the nn.BatchNorm variable tree (checkpoint/torch-import interop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from med_tpu.models.resnet import ResNet50, SubsampledBatchNorm


def _apply(mod, x, train):
    vars_ = mod.init(jax.random.key(0), x)
    y, mut = mod.apply(vars_, x, mutable=["batch_stats"])
    return vars_, y, mut["batch_stats"]


def test_stride1_equals_flax_batchnorm(rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 8)) * 2 + 1, jnp.float32)
    for train in (True, False):
        ours = SubsampledBatchNorm(stat_stride=1,
                                   use_running_average=not train,
                                   momentum=0.9)
        ref = nn.BatchNorm(use_running_average=not train, momentum=0.9)
        v_o, y_o, s_o = _apply(ours, x, train)
        v_r, y_r, s_r = _apply(ref, x, train)
        np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_r),
                                   rtol=1e-6, atol=1e-6)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(s_o[k]), np.asarray(s_r[k]), rtol=1e-6, atol=1e-6)


def test_strided_stats_match_manual(rng):
    x = jnp.asarray(rng.normal(size=(8, 6, 5, 4)) * 3 - 2, jnp.float32)
    mod = SubsampledBatchNorm(stat_stride=4, use_running_average=False,
                              momentum=0.9)
    vars_, y, stats = _apply(mod, x, True)
    # ghost-batch statistics: the first B/stride images, contiguous slice
    sub = np.asarray(x)[:2]
    mean = sub.mean(axis=(0, 1, 2))
    var = (sub ** 2).mean(axis=(0, 1, 2)) - mean ** 2
    want = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
    # running stats: momentum blend from the init (0, 1)
    np.testing.assert_allclose(np.asarray(stats["mean"]), 0.1 * mean,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]), 0.9 + 0.1 * var,
                               rtol=1e-5, atol=1e-6)


def test_eval_mode_uses_running_stats(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    mod = SubsampledBatchNorm(stat_stride=2, use_running_average=True)
    vars_ = mod.init(jax.random.key(0), x)
    y = mod.apply(vars_, x)  # mean 0 / var 1 init -> identity
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5,
                               atol=1e-5)


def test_resnet_ghost_bn_tree_matches_exact(rng):
    """bn_stat_stride changes no variable names/shapes: the same checkpoint
    (and torchvision import) loads under either setting."""
    x = jnp.zeros((2, 32, 32, 3))
    kw = dict(stage_sizes=(1, 1), width=8)
    v1 = ResNet50(**kw).init({"params": jax.random.key(0)}, x, train=False)
    v4 = ResNet50(**kw, bn_stat_stride=4).init(
        {"params": jax.random.key(0)}, x, train=False)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v4))
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v4)):
        assert a.shape == b.shape

    # and a train-mode forward runs + mutates stats under ghost BN
    xr = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    y, mut = ResNet50(**kw, bn_stat_stride=4).apply(
        v4, xr, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 64)  # width 8, 2 stages: 8 * 2 * 4
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        v4["batch_stats"], mut["batch_stats"])
    assert max(jax.tree.leaves(changed)) > 0