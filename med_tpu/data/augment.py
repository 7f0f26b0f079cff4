"""On-device image augmentations for ResNet fine-tuning.

The reference defines seeded RandomCrop / RandomHorizontalFlip /
RandomRotation / ColorJitter transforms for the backbone fine-tune
(resnet_finetuning.ipynb cell 4, ``image_train_transform``). Here the same
family runs inside the jitted train step on TPU: per-image PRNG keys drive
pad+crop, horizontal flip, small-angle rotation, and brightness/contrast
jitter. Everything is shape-static and batched.

Layout contract: the fused pipeline (:func:`augment_batch`) transposes the
NHWC input to **channel-first (B, C, H, W)** once at entry and back once at
exit. With C=3 minor, XLA keeps the 3-wide channel axis on the 128-wide
lane dimension for every intermediate, so each elementwise pass runs at
~1/40th of HBM bandwidth — the augment chain measured ~31 ms of a 69 ms
batch-32 fine-tune step. Channel-first puts W=224 on lanes and the whole
chain runs at memory speed (and the rotation becomes gather-free, see
:func:`_shift_lerp`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- public NHWC
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
    """Per-image rotation by U(±max_degrees) with linear resampling around
    the image center (zero fill outside), matching torchvision
    RandomRotation (resnet_finetuning.ipynb cell 4) up to the resampling
    scheme. images (B, H, W, C)."""
    x = jnp.transpose(images, (0, 3, 1, 2))
    x = _rotation_cf(key, x, max_degrees)
    return jnp.transpose(x, (0, 2, 3, 1))


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


# ------------------------------------------------ channel-first (B, C, H, W)
def _shift_lerp(x: jnp.ndarray, t: jnp.ndarray, k_max: int, axis: int):
    """Fractional shift with zero fill along ``axis`` (2 = H, 3 = W) of a
    channel-first (B, C, H, W) tensor: ``out[..., i, ...] = x[..., i + t,
    ...]`` with linear interpolation. The shift varies along the *other*
    spatial axis: for axis=2, ``t`` is (B, W); for axis=3, (B, H).

    Gather-free formulation: out = sum_k tent(t - k) * slice_k(xpad) over
    the 2*k_max+1 integer shifts — per row only the two tent weights
    bracketing t are nonzero, so the sum IS the lerp. Every term is a
    static slice of one shared zero-padded buffer, which XLA fuses into a
    single elementwise pass; a per-pixel bilinear gather of the same warp
    ran at ~13-16 ms per corner tap (batch 32 at 224^2) because TPU lowers
    arbitrary gathers to near-serial HBM taps."""
    B, C, H, W = x.shape
    pad = [(0, 0)] * 4
    pad[axis] = (k_max, k_max)
    xpad = jnp.pad(x, pad)
    n = x.shape[axis]
    acc = jnp.zeros_like(x)
    for k in range(-k_max, k_max + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t - k))
        if axis == 2:
            sl = xpad[:, :, k_max + k: k_max + k + n, :]
            acc = acc + w[:, None, None, :] * sl
        else:
            sl = xpad[:, :, :, k_max + k: k_max + k + n]
            acc = acc + w[:, None, :, None] * sl
    return acc


def rotate_batch_cf(x: jnp.ndarray, angles_rad: jnp.ndarray,
                    max_radians: float):
    """Rotate a channel-first batch (B, C, H, W) by per-image ``angles_rad``
    via the Paeth 3-shear decomposition
    ``R(a) = A(-tan(a/2)) . B(sin a) . A(-tan(a/2))``: A is a per-column
    shift along y, B a per-row shift along x — three gather-free
    :func:`_shift_lerp` passes, no transposes. ``max_radians`` (static)
    bounds |angle| and sizes the shear slice windows.

    DOCUMENTED DEVIATION vs the reference's torchvision
    RandomRotation(resample=bilinear): the three sequential 1-D linear
    interpolations apply a slightly wider effective resampling stencil than
    one 2-D bilinear pass, i.e. a touch more smoothing (measured ~2-4 units
    mean abs on [0,255] noise images at 10 deg, exact at angle 0 and
    wherever a shear's shift is integral — tests/test_augment.py pins the
    bound). Augmentation angles are random draws, so training behavior is
    equivalent; the win is a gather-free TPU lowering (the per-pixel
    bilinear gather ran at ~13-16 ms per corner tap at batch 32, 224^2)."""
    B, C, H, W = x.shape
    angles = jnp.asarray(angles_rad, jnp.float32)
    alpha = -jnp.tan(angles / 2.0)   # y-shift per column, passes 1 and 3
    beta = jnp.sin(angles)           # x-shift per row, pass 2
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    dxs = jnp.arange(W, dtype=jnp.float32) - cx
    dys = jnp.arange(H, dtype=jnp.float32) - cy
    rad = float(max_radians)
    k_a = int(np.ceil(np.tan(rad / 2.0) * max(cx, 1.0))) + 1
    k_b = int(np.ceil(np.sin(rad) * max(cy, 1.0))) + 1

    t_a = alpha[:, None] * dxs[None]  # (B, W): y-source shift for column x
    t_b = beta[:, None] * dys[None]   # (B, H): x-source shift for row y

    x = _shift_lerp(x, t_a, k_a, axis=2)
    x = _shift_lerp(x, t_b, k_b, axis=3)
    return _shift_lerp(x, t_a, k_a, axis=2)


def _rotation_cf(key, x: jnp.ndarray, max_degrees: float):
    """Per-image U(±max_degrees) rotation on (B, C, H, W); see
    :func:`rotate_batch_cf` for the 3-shear scheme and its documented
    deviation from single-pass bilinear."""
    B = x.shape[0]
    angles = jax.random.uniform(
        key, (B,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)
    return rotate_batch_cf(x, angles, float(max_degrees) * np.pi / 180.0)


def _crop_cf(key, x: jnp.ndarray, pad: int):
    B, C, H, W = x.shape
    padded = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="reflect")
    kx, ky = jax.random.split(key)
    off_y = jax.random.randint(ky, (B,), 0, 2 * pad + 1)
    off_x = jax.random.randint(kx, (B,), 0, 2 * pad + 1)

    def crop_one(img, oy, ox):
        return jax.lax.dynamic_slice(img, (0, oy, ox), (C, H, W))

    return jax.vmap(crop_one)(padded, off_y, off_x)


def _flip_cf(key, x: jnp.ndarray, p: float = 0.5):
    flip = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, :, ::-1], x)


def _jitter_cf(key, x: jnp.ndarray, brightness: float, contrast: float):
    B = x.shape[0]
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                           maxval=1 + brightness)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * c + mean * b


def augment_batch(
    key,
    images: jnp.ndarray,
    crop_pad: int = 8,
    max_degrees: float = 10.0,
    brightness: float = 0.2,
    contrast: float = 0.2,
    value_range: Tuple[float, float] = (0.0, 255.0),
    normalize: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Full fine-tuning augmentation: jitter -> rotate -> crop -> flip,
    computed channel-first (one NHWC<->NCHW transpose pair at the
    boundaries — see module docstring for why).

    ``normalize=(mean, std)`` optionally fuses the driver's ``/255`` +
    per-channel standardization (reference image_transform,
    preprocessing_utils.py:697-705) into the channel-first domain, where
    the per-channel affine is a fast sublane broadcast instead of a
    lane-padded pass over the NHWC output."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jnp.transpose(images, (0, 3, 1, 2))
    x = _jitter_cf(k1, x, brightness, contrast)
    x = jnp.clip(x, *value_range)
    x = _rotation_cf(k2, x, max_degrees)
    x = _crop_cf(k3, x, crop_pad)
    x = _flip_cf(k4, x)
    if normalize is not None:
        mean, std = normalize
        x = (x / value_range[1] - mean.reshape(1, -1, 1, 1)) \
            / std.reshape(1, -1, 1, 1)
    return jnp.transpose(x, (0, 2, 3, 1))
