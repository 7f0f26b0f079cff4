"""Loss-layer golden tests: torch-parity for BCE/CE/soft-CE/smoothing and
the COG fusion label resampling under padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

from med_tpu.train import losses  # noqa: E402


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(64,)).astype(np.float32)
    labels = rng.integers(0, 2, 64).astype(np.float32)
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(tF.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels)))
    assert got == pytest.approx(want, rel=1e-5)
    # pos_weight
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels),
                                       pos_weight=2.5))
    want = float(tF.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels),
        pos_weight=torch.tensor(2.5)))
    assert got == pytest.approx(want, rel=1e-5)


def test_ce_matches_torch(rng):
    logits = rng.normal(size=(40, 6)).astype(np.float32)
    labels = rng.integers(0, 6, 40)
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(tF.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert got == pytest.approx(want, rel=1e-5)
    # class weights: torch weights the mean by per-example weight
    w = rng.random(6).astype(np.float32) + 0.5
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                     class_weights=jnp.asarray(w)))
    want = float(tF.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                                  weight=torch.tensor(w)))
    assert got == pytest.approx(want, rel=1e-4)


def test_soft_ce_matches_torch(rng):
    logits = rng.normal(size=(30, 2)).astype(np.float32)
    y = rng.integers(0, 2, 30).astype(np.float32)
    targets = np.stack([1 - y, y], -1)
    got = float(losses.soft_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(tF.cross_entropy(torch.tensor(logits), torch.tensor(targets)))
    assert got == pytest.approx(want, rel=1e-5)


def test_smooth_loss_matches_reference_formula(rng):
    logits = rng.normal(size=(50, 2)).astype(np.float32)
    got = float(losses.smooth_loss(jnp.asarray(logits)))
    p = torch.tensor(logits)
    mse = tF.mse_loss(tF.log_softmax(p[1:], dim=1),
                      tF.log_softmax(p.detach()[:-1], dim=1), reduction="none")
    want = float(torch.mean(torch.clamp(mse, min=0, max=16)))
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("T,factor", [(100, 16), (96, 16), (123, 16), (100, 1)])
def test_nearest_resample_dynamic_matches_fusion(rng, T, factor):
    """The padded dynamic resample reproduces the reference `fusion` label
    mapping: F.interpolate(labels (1,1,T), size=T_track, 'nearest')
    (modeling_utils.py:2191-2211) on the valid prefix."""
    Tpad = 128 if T <= 128 else 256
    t_track_pad = Tpad // factor
    true_out = max(T // factor, 1)
    labels = rng.integers(0, 6, Tpad)
    labels[T:] = 0

    got = np.asarray(losses.nearest_resample_dynamic(
        jnp.asarray(labels), jnp.asarray(T), t_track_pad))[:true_out]
    want = tF.interpolate(
        torch.tensor(labels[:T].astype(np.float32))[None, None],
        size=true_out, mode="nearest",
    ).long().numpy().ravel()
    np.testing.assert_array_equal(got, want)


def test_cog_track_loss_masks_padding(rng):
    """Padding frames cannot change the track loss."""
    Tpad, T = 128, 100
    logits = jnp.asarray(rng.normal(size=(1, Tpad, 2)), jnp.float32)
    labels = np.zeros(Tpad, np.int64)
    labels[:T] = rng.integers(0, 2, T)
    ce1, sm1 = losses.cog_track_loss(logits, jnp.asarray(labels),
                                     jnp.asarray(T), 0.15)
    labels2 = labels.copy()
    labels2[T:] = 1  # corrupt the padding
    ce2, sm2 = losses.cog_track_loss(logits, jnp.asarray(labels2),
                                     jnp.asarray(T), 0.15)
    assert float(ce1) == pytest.approx(float(ce2), abs=1e-6)
    assert float(sm1) == pytest.approx(float(sm2), abs=1e-6)
