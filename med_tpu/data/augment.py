"""On-device image augmentations for ResNet fine-tuning.

The reference defines seeded RandomCrop / RandomHorizontalFlip /
RandomRotation / ColorJitter transforms for the backbone fine-tune
(resnet_finetuning.ipynb cell 4, ``image_train_transform``). Here the same
family runs inside the jitted train step on TPU: per-image PRNG keys drive
pad+crop, horizontal flip, small-angle rotation (bilinear resample), and
brightness/contrast jitter. Everything is shape-static and batched.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_horizontal_flip(key, images: jnp.ndarray, p: float = 0.5):
    """images (B, H, W, C); per-image flip with probability p."""
    flip = jax.random.bernoulli(key, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_crop(key, images: jnp.ndarray, pad: int = 8):
    """Reflection-pad by ``pad`` then take a random crop of the original
    size, per image (torch RandomCrop(size, padding=pad))."""
    B, H, W, C = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")
    kx, ky = jax.random.split(key)
    off_y = jax.random.randint(ky, (B,), 0, 2 * pad + 1)
    off_x = jax.random.randint(kx, (B,), 0, 2 * pad + 1)

    def crop_one(img, oy, ox):
        return jax.lax.dynamic_slice(img, (oy, ox, 0), (H, W, C))

    return jax.vmap(crop_one)(padded, off_y, off_x)


def random_rotation(key, images: jnp.ndarray, max_degrees: float = 10.0):
    """Per-image rotation by U(±max_degrees) with bilinear resampling around
    the image center (zero fill outside)."""
    B, H, W, C = images.shape
    angles = jax.random.uniform(
        key, (B,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    def rotate_one(img, a):
        cos, sin = jnp.cos(a), jnp.sin(a)
        src_y = cos * (yy - cy) - sin * (xx - cx) + cy
        src_x = sin * (yy - cy) + cos * (xx - cx) + cx
        y0 = jnp.clip(jnp.floor(src_y), 0, H - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(src_x), 0, W - 1).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        wy = jnp.clip(src_y, 0, H - 1) - y0
        wx = jnp.clip(src_x, 0, W - 1) - x0
        v = (
            img[y0, x0] * ((1 - wy) * (1 - wx))[..., None]
            + img[y0, x1] * ((1 - wy) * wx)[..., None]
            + img[y1, x0] * (wy * (1 - wx))[..., None]
            + img[y1, x1] * (wy * wx)[..., None]
        )
        inside = (
            (src_y >= 0) & (src_y <= H - 1) & (src_x >= 0) & (src_x <= W - 1)
        )
        return jnp.where(inside[..., None], v, 0.0)

    return jax.vmap(rotate_one)(images, angles)


def color_jitter(key, images: jnp.ndarray, brightness: float = 0.2,
                 contrast: float = 0.2):
    """Per-image multiplicative brightness and contrast jitter (the
    0-255/0-1 range is preserved by the caller's clipping)."""
    B = images.shape[0]
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                           maxval=1 + brightness)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    mean = images.mean(axis=(1, 2, 3), keepdims=True)
    return (images - mean) * c + mean * b


def augment_batch(
    key,
    images: jnp.ndarray,
    crop_pad: int = 8,
    max_degrees: float = 10.0,
    brightness: float = 0.2,
    contrast: float = 0.2,
    value_range: Tuple[float, float] = (0.0, 255.0),
) -> jnp.ndarray:
    """Full fine-tuning augmentation: jitter -> rotate -> crop -> flip."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = color_jitter(k1, images, brightness, contrast)
    x = jnp.clip(x, *value_range)
    x = random_rotation(k2, x, max_degrees)
    x = random_crop(k3, x, crop_pad)
    return random_horizontal_flip(k4, x)
