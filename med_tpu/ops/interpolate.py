"""1-D resampling with torch ``F.interpolate`` index semantics.

Used by the COG FPN upsample-add (reference models_COG.py:186-203, linear)
and the multi-resolution loss fusion (reference modeling_utils.py:2191-2211,
nearest). Implemented as static gathers / lerps so XLA fuses them; shapes are
static under jit, matching the bucketed-length frame pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest': src = floor(i * in/out)
    return np.minimum(
        (np.arange(out_size) * (in_size / out_size)).astype(np.int64),
        in_size - 1,
    )


def interp1d_nearest(x: jnp.ndarray, out_size: int, axis: int = -1) -> jnp.ndarray:
    """Nearest-neighbor resample along ``axis`` to ``out_size``."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx = jnp.asarray(_nearest_indices(in_size, out_size))
    return jnp.take(x, idx, axis=axis)


def interp1d_linear(x: jnp.ndarray, out_size: int, axis: int = -1) -> jnp.ndarray:
    """Linear resample along ``axis`` (align_corners=False, torch default)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)

    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w).reshape(shape)
    return x_lo * (1.0 - w) + x_hi * w
