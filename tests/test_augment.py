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


# --------------------------------------------------------------------------
# Quantitative 3-shear-vs-bilinear oracle (round-4 VERDICT item 3): the
# Paeth 3-shear rotation is NOT exact vs torchvision RandomRotation's
# single-pass bilinear resampling — three sequential 1-D lerps apply a wider
# effective smoothing stencil. These tests prove HOW inexact: tight on
# smooth images, bounded on worst-case white noise, exact for affine images
# and integral shifts. Documented deviation in docs/COMPONENTS.md.
# --------------------------------------------------------------------------

def _bilinear_rotate(img: np.ndarray, angle: float) -> np.ndarray:
    """Literal bilinear-gather rotation oracle (zero fill): the resampling
    scheme of torchvision RandomRotation(interpolation=BILINEAR),
    resnet_finetuning.ipynb image_train_transform. Source convention
    matches rotate_batch_cf: src = R(-angle) @ (dst - c) + c."""
    H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    dy, dx = ys - cy, xs - cx
    ca, sa = np.cos(angle), np.sin(angle)
    sy = ca * dy - sa * dx + cy
    sx = sa * dy + ca * dx + cx
    y0, x0 = np.floor(sy).astype(int), np.floor(sx).astype(int)
    wy, wx = sy - y0, sx - x0

    def samp(yy, xx):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = np.zeros((H, W))
        v[valid] = img[yy[valid], xx[valid]]
        return v

    return (samp(y0, x0) * (1 - wy) * (1 - wx)
            + samp(y0, x0 + 1) * (1 - wy) * wx
            + samp(y0 + 1, x0) * wy * (1 - wx)
            + samp(y0 + 1, x0 + 1) * wy * wx)


def _interior(H, W, max_rad, extra=3):
    """Slice away the border band where the two schemes' zero-fill regions
    (and the shear's intermediate clipping) legitimately differ."""
    m = (int(np.ceil(np.tan(max_rad / 2) * W / 2))
         + int(np.ceil(np.sin(max_rad) * H / 2)) + extra)
    return np.s_[m:-m, m:-m]


@pytest.mark.parametrize("deg", [-10.0, -5.0, 2.0, 10.0])
def test_rotation_matches_bilinear_oracle_smooth(deg):
    """On band-limited content the 3-shear tracks single-pass bilinear to
    well under one gray level (measured max 0.49 / mean 0.07 on [0,255])."""
    from med_tpu.data.augment import rotate_batch_cf

    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W]
    img = (127 + 100 * np.sin(yy / 7.0) * np.cos(xx / 9.0)).astype(np.float32)
    rad = np.deg2rad(deg)
    out = np.asarray(rotate_batch_cf(
        jnp.asarray(img[None, None]), jnp.asarray([rad]),
        np.deg2rad(10.0)))[0, 0]
    oracle = _bilinear_rotate(img.astype(np.float64), rad)
    err = np.abs(out - oracle)[_interior(H, W, np.deg2rad(10.0))]
    assert err.max() < 1.0, err.max()
    assert err.mean() < 0.15, err.mean()


@pytest.mark.parametrize("deg", [2.0, 10.0])
def test_rotation_bilinear_gap_bounded_on_noise(deg, rng):
    """Worst case (white noise, no meaningful interpolant): the schemes'
    different smoothing stencils diverge by ~11 gray levels mean /
    ~100 max on [0,255] — the documented magnitude of the deviation."""
    from med_tpu.data.augment import rotate_batch_cf

    H = W = 64
    img = rng.integers(0, 256, (H, W)).astype(np.float32)
    rad = np.deg2rad(deg)
    out = np.asarray(rotate_batch_cf(
        jnp.asarray(img[None, None]), jnp.asarray([rad]),
        np.deg2rad(10.0)))[0, 0]
    oracle = _bilinear_rotate(img.astype(np.float64), rad)
    err = np.abs(out - oracle)[_interior(H, W, np.deg2rad(10.0))]
    assert err.mean() < 16.0, err.mean()
    assert err.max() < 150.0, err.max()
    # and it IS inexact — this pins that the deviation is real, so the doc
    # claim can never silently regress to "exact"
    assert err.mean() > 1.0, err.mean()


@pytest.mark.parametrize("deg", [-10.0, 7.0])
def test_rotation_exact_on_affine_images(deg):
    """Both schemes reproduce affine images exactly (tent weights sum to 1
    with first moment t), so the 3-shear equals the ANALYTIC rotation on
    img(y,x) = p + q*y + r*x in the interior."""
    from med_tpu.data.augment import rotate_batch_cf

    H = W = 64
    cy = cx = (H - 1) / 2.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    p, q, r = 40.0, 1.25, -0.75
    img = (p + q * yy + r * xx).astype(np.float32)
    rad = np.deg2rad(deg)
    out = np.asarray(rotate_batch_cf(
        jnp.asarray(img[None, None]), jnp.asarray([rad]),
        np.deg2rad(10.0)))[0, 0]
    ca, sa = np.cos(rad), np.sin(rad)
    sy = ca * (yy - cy) - sa * (xx - cx) + cy
    sx = sa * (yy - cy) + ca * (xx - cx) + cx
    analytic = p + q * sy + r * sx
    err = np.abs(out - analytic)[_interior(H, W, np.deg2rad(10.0))]
    np.testing.assert_array_less(err.max(), 1e-3)


def test_shift_lerp_exact_for_integral_shifts(rng):
    """The shear primitive is EXACT (a pure shifted copy) whenever the
    per-row/column shift is integral — the lerp's tent weights collapse to
    a single 1."""
    from med_tpu.data.augment import _shift_lerp

    x = jnp.asarray(rng.normal(size=(2, 3, 16, 16)), jnp.float32)
    t = jnp.asarray(rng.integers(-3, 4, (2, 16)), jnp.float32)  # (B, W)
    out = np.asarray(_shift_lerp(x, t, k_max=4, axis=2))
    xn = np.asarray(x)
    tn = np.asarray(t).astype(int)
    expect = np.zeros_like(xn)
    for b in range(2):
        for col in range(16):
            for i in range(16):
                src = i + tn[b, col]
                if 0 <= src < 16:
                    expect[b, :, i, col] = xn[b, :, src, col]
    np.testing.assert_allclose(out, expect, atol=1e-5)


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
