"""Image augmentation ops (resnet_finetuning.ipynb transform family)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from med_tpu.data.augment import (
    augment_batch,
    color_jitter,
    random_crop,
    random_horizontal_flip,
    random_rotation,
)


@pytest.fixture
def images(rng):
    return jnp.asarray(rng.integers(0, 256, size=(4, 32, 32, 3)), jnp.float32)


def test_flip_is_exact_mirror(images):
    out = random_horizontal_flip(jax.random.key(0), images, p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images)[:, :, ::-1])
    out = random_horizontal_flip(jax.random.key(0), images, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


def test_crop_preserves_shape_and_content(images):
    out = random_crop(jax.random.key(1), images, pad=4)
    assert out.shape == images.shape
    # a crop is a contiguous sub-window of the padded image: values subset
    assert float(out.max()) <= float(images.max())
    assert float(out.min()) >= float(images.min())


def test_rotation_identity_at_zero(images):
    out = random_rotation(jax.random.key(2), images, max_degrees=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images), atol=1e-3)


def test_rotation_moves_pixels(images):
    out = random_rotation(jax.random.key(3), images, max_degrees=30.0)
    assert np.abs(np.asarray(out) - np.asarray(images)).max() > 1.0


def test_color_jitter_brightness_contrast(images):
    out = color_jitter(jax.random.key(4), images, brightness=0.5, contrast=0.0)
    # pure brightness: per-image scalar applied to the mean component only;
    # with contrast=0 the centered part is unchanged
    centered_in = np.asarray(images) - np.asarray(images).mean((1, 2, 3), keepdims=True)
    centered_out = np.asarray(out) - np.asarray(out).mean((1, 2, 3), keepdims=True)
    np.testing.assert_allclose(centered_out, centered_in, atol=1e-3)


def test_augment_batch_deterministic(images):
    a = augment_batch(jax.random.key(5), images)
    b = augment_batch(jax.random.key(5), images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(jax.random.key(6), images)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3
    assert a.shape == images.shape
