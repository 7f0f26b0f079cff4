"""Loss functions.

Reference semantics (modeling_utils.py):
- window binary: BCE-with-logits, optional pos_weight = n_neg/n_pos (:233-246)
- window multi-class: CE over the 6 powerset classes, optional reciprocal
  class-count weights (:240-248)
- sequential: per-example CE masked to true-error examples, mean over the
  mask (:612-625)
- frame (TeCNo/TSVN): CE against *soft* two-column targets [1-y, y],
  averaged across TCN stages (:278-297, :1310-1316)
- COG: per output track, CE + λ·mean(clamp(MSE(log_softmax p_t,
  log_softmax p_{t-1}.detach), 0, 16)), averaged over mstcn_stages
  (:1501-1521)

All frame losses take an explicit validity mask so variable-length trials
can be padded to static bucket lengths under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    pos_weight: Optional[float] = None,
) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w_pos = 1.0 if pos_weight is None else pos_weight
    per = -(w_pos * labels * log_p + (1.0 - labels) * log_not_p)
    return _masked_mean(per, mask)


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over integer labels (torch CrossEntropyLoss semantics:
    with class weights, the mean is weighted by the per-example weight)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.reshape(logits.shape[:-1]).astype(jnp.int32)
    per = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights)[labels]
        if mask is not None:
            w = w * mask.reshape(w.shape)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return _masked_mean(per, mask)


def soft_cross_entropy(
    logits: jnp.ndarray,
    target_probs: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CE against probability targets (torch CE accepts soft targets;
    used with [1-y, y] two-column targets, modeling_utils.py:284-292)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(target_probs * logp, axis=-1)
    return _masked_mean(per, mask)


def tecno_stage_loss(
    stage_logits: jnp.ndarray,
    binary_labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Average soft-CE over stages; stage_logits (S, B, T, 2), labels (B, T)."""
    y = binary_labels.astype(stage_logits.dtype)
    targets = jnp.stack([1.0 - y, y], axis=-1)  # (B, T, 2)

    def per_stage(logits):
        return soft_cross_entropy(logits, targets, mask)

    losses = jax.vmap(per_stage)(stage_logits)
    return jnp.mean(losses)


def smooth_loss(
    track_logits: jnp.ndarray, pair_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Truncated-MSE temporal smoothing (reference modeling_utils.py:1508).

    track_logits (T, C): mean over clamp((logsoftmax p_t - logsoftmax
    p_{t-1}.detach)^2, 0, 16); the previous frame is detached.
    """
    logp = jax.nn.log_softmax(track_logits, axis=-1)
    prev = jax.lax.stop_gradient(logp[:-1])
    sq = jnp.clip(jnp.square(logp[1:] - prev), 0.0, 16.0)
    if pair_mask is None:
        return jnp.mean(sq)
    return _masked_mean(jnp.mean(sq, axis=-1), pair_mask)


def nearest_resample_dynamic(
    x: jnp.ndarray, true_len: jnp.ndarray, out_len_static: int
) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') with a *dynamic* source length.

    x (Tpad, ...) padded array whose first ``true_len`` entries are valid;
    output has static length ``out_len_static`` where position i reads
    ``floor(i * true_out / out_len... )`` — precisely: the reference resizes
    to ``true_out`` positions; here position i < true_out maps to source
    ``floor(i * true_len / true_out)``; positions >= true_out are padding.
    ``true_out`` must be supplied by the caller through the returned mask
    computation — this helper just needs the source mapping, so it takes
    ``true_out`` implied by out_len_static scale: used with
    true_out = floor(true_len * out_len_static / x.shape[0]).
    """
    t_pad = x.shape[0]
    true_out = (true_len * out_len_static) // t_pad
    true_out = jnp.maximum(true_out, 1)
    i = jnp.arange(out_len_static)
    src = jnp.floor(i * (true_len / true_out)).astype(jnp.int32)
    src = jnp.clip(src, 0, t_pad - 1)
    return jnp.take(x, src, axis=0)


def cog_track_loss(
    track_logits: jnp.ndarray,
    labels: jnp.ndarray,
    true_len: jnp.ndarray,
    lam: float,
    class_weights: Optional[jnp.ndarray] = None,
) -> tuple:
    """CE + smoothing for one COG output track.

    track_logits (1, T_track, C); labels (Tpad,) integer labels on the
    full-resolution grid; true_len = valid frames at full resolution.
    Labels are nearest-resampled to the track grid exactly as the
    reference's ``fusion`` (modeling_utils.py:2191-2211).
    """
    logits = track_logits[0]
    t_track = logits.shape[0]
    track_labels = nearest_resample_dynamic(labels, true_len, t_track)
    t_pad_full = labels.shape[0]
    true_out = jnp.maximum((true_len * t_track) // t_pad_full, 1)
    mask = (jnp.arange(t_track) < true_out).astype(logits.dtype)
    ce = cross_entropy(logits, track_labels, mask, class_weights)
    pair_mask = mask[1:] * mask[:-1]
    sm = smooth_loss(logits, pair_mask)
    return ce, sm


def _masked_mean(per: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(per)
    m = mask.reshape(per.shape).astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1e-12)
