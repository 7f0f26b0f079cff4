"""Sequence parallelism (SP) for the frame families: shard a trial's time
axis T over the mesh and train on sequences no single chip can hold.

Motivation: frame trials are batch_size=1 whole sequences (reference
train_frame.ipynb cell 1), so data parallelism cannot split ONE long trial,
and the fused whole-sequence kernels have a measured VMEM boundary
(`ops/tcn_fused.fused_stack_fits`, CLAUDE.md round-3 notes: eval kernel OOMs
at T≳6144). SP removes the per-chip T ceiling: every activation, dropout
mask and attention band lives shard-local; only O(receptive-field) frames
move over ICI.

TPU-first design — no NCCL-style send/recv loops, just XLA collectives
inside one `jax.shard_map`:

- The causal dilated conv taps of the TCN stacks read x[t-d], x[t-2d]
  (models/layers.py::ResidualStack, reference models_TCN.py:104-137). Under
  SP these become :func:`seq_shift_right` — a *distributed shift*: at most
  two `lax.ppermute` shard rotations plus one local splice, because the
  globally shifted block of shard i overlaps at most two source shards.
  Out-of-range positions receive zeros from ppermute's non-listed
  destinations — exactly the causal left-padding of the single-chip path,
  so SP is bit-for-bit the same math (f32).
- 1x1 convs, relus, softmax-over-classes, LayerNorm-over-features and
  dropout are frame-local: no communication.
- The stage-averaged soft-CE loss (train/losses.py::tecno_stage_loss) is a
  masked mean over global T: local numerator/denominator + one `psum`.
- Gradients: `jax.value_and_grad` INSIDE shard_map differentiates the
  ppermutes (transpose of a shift is the opposite shift). NO explicit grad
  psum: the loss's forward `psum` transposes to a psum of the cotangents,
  so each device's grad already carries every shard's terms — replicated
  `out_specs=P()` is exact (verified 1.0000x vs the single-chip gradient on
  a 4x2 mesh; an explicit psum would over-count by the axis size).

Weight layout is the stock TeCNo param tree (models/tcn.py) — SP consumes
the same checkpoints, no re-import needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ---------------------------------------------------------------------------
# distributed shift
# ---------------------------------------------------------------------------


def seq_shift_right(x: jnp.ndarray, offset: int, axis_name: str) -> jnp.ndarray:
    """Local block of the globally right-shifted sequence.

    ``x`` is this device's (T_local, ...) block of a global sequence sharded
    along axis 0 over ``axis_name``; returns the local block of
    ``y[g] = x_global[g - offset]`` with zeros for ``g < offset`` (the causal
    left-pad). ``offset`` is static.

    The target block spans at most two source shards (offset = k*S + r:
    rows >= r come from shard i-k, rows < r from shard i-k-1), so this costs
    at most two ppermutes + one splice regardless of offset size.
    """
    if offset == 0:
        return x
    n = lax.axis_size(axis_name)
    S = x.shape[0]
    k, r = divmod(offset, S)
    if k >= n:
        return jnp.zeros_like(x)

    def shift_shards(steps: int) -> jnp.ndarray:
        if steps == 0:
            return x
        if steps >= n:
            return jnp.zeros_like(x)
        perm = [(i, i + steps) for i in range(n - steps)]
        return lax.ppermute(x, axis_name, perm)

    a = shift_shards(k)
    if r == 0:
        return a
    b = shift_shards(k + 1)
    return jnp.concatenate([b[S - r :], a[: S - r]], axis=0)


# ---------------------------------------------------------------------------
# SP TeCNo forward
# ---------------------------------------------------------------------------


def sp_residual_stack(
    x: jnp.ndarray,
    w3: jnp.ndarray,
    b3: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    *,
    axis_name: str,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.5,
) -> jnp.ndarray:
    """Dilated residual stack on a T-sharded (T_local, C) block — the exact
    math of ``ResidualStack.__call__``'s XLA path (models/layers.py:258-276;
    reference models_TCN.py:104-137) with the causal taps distributed.

    ``mask``: optional (L, T_local, C) keep-mask block (uint8) of a GLOBAL
    dropout mask sharded along T; scaled by 1/(1-rate) like the single-chip
    path.
    """
    L = w3.shape[0]
    keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for i in range(L):
        d = 2 ** i
        # causal taps: y[t] = w3[i,0]·x[t-2d] + w3[i,1]·x[t-d] + w3[i,2]·x[t]
        y = (
            seq_shift_right(x, 2 * d, axis_name) @ w3[i, 0]
            + seq_shift_right(x, d, axis_name) @ w3[i, 1]
            + x @ w3[i, 2]
            + b3[i]
        )
        y = jax.nn.relu(y) @ w1[i] + b1[i]
        if mask is not None:
            y = y * mask[i].astype(y.dtype) * keep
        x = x + y
    return x


def _conv1x1(x, conv_params):
    """Conv1d(k=1) on a local block: params {'Conv_0': {'kernel' (1,I,O),
    'bias' (O,)}} (models/layers.py::Conv1d)."""
    p = conv_params["Conv_0"]
    return x @ p["kernel"][0] + p["bias"]


def sp_single_stage(stage_params, x, *, axis_name, mask=None,
                    dropout_rate=0.5):
    """One MS-TCN stage (models/layers.py::SingleStageTCN) on a T-sharded
    block: conv1x1 in -> SP residual stack -> conv1x1 out."""
    h = _conv1x1(x, stage_params["conv_in"])
    st = stage_params["stack"]
    h = sp_residual_stack(
        h, st["w3"], st["b3"], st["w1"], st["b1"],
        axis_name=axis_name, mask=mask, dropout_rate=dropout_rate,
    )
    logits = _conv1x1(h, stage_params["conv_out"])
    return h, logits.astype(jnp.float32)


def sp_tecno_forward(params, x, *, num_stages: int, axis_name: str,
                     masks=None, dropout_rate: float = 0.5):
    """TeCNo (models/tcn.py; reference models_TCN.py:17-101) on a T-sharded
    (T_local, C) block: stage 0 on features, later stages refine the softmax
    of the previous logits (frame-local). Returns (num_stages, T_local, 2).

    ``masks``: optional (num_stages, L, T_local, C) dropout keep-mask block.
    """
    _, logits = sp_single_stage(
        params["stage0"], x, axis_name=axis_name,
        mask=None if masks is None else masks[0],
        dropout_rate=dropout_rate,
    )
    outputs = [logits]
    for s in range(1, num_stages):
        _, logits = sp_single_stage(
            params[f"stage{s}"], jax.nn.softmax(logits, axis=-1),
            axis_name=axis_name,
            mask=None if masks is None else masks[s],
            dropout_rate=dropout_rate,
        )
        outputs.append(logits)
    return jnp.stack(outputs, axis=0)


def sp_tecno_loss(params, x, labels, mask, *, num_stages, axis_name,
                  masks=None, dropout_rate=0.5):
    """Stage-averaged soft CE over GLOBAL T (train/losses.py::
    tecno_stage_loss; reference modeling_utils.py:278-297): local masked
    sums + one psum pair."""
    logits = sp_tecno_forward(
        params, x, num_stages=num_stages, axis_name=axis_name,
        masks=masks, dropout_rate=dropout_rate,
    )
    y = labels.astype(logits.dtype)
    targets = jnp.stack([1.0 - y, y], axis=-1)  # (T_local, 2)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(targets[None] * logp, axis=-1)  # (S, T_local)
    m = mask.astype(logits.dtype)
    num = lax.psum(jnp.sum(per * m[None], axis=-1), axis_name)  # (S,)
    den = lax.psum(jnp.sum(m), axis_name)
    return jnp.mean(num / jnp.maximum(den, 1e-12))


# ---------------------------------------------------------------------------
# SP train step
# ---------------------------------------------------------------------------


def sp_dropout_masks(key, *, num_stages, num_layers, T, channels):
    """Global (num_stages, L, T, C) keep-masks at rate 0.5, bit-unpacked
    from threefry words exactly like ``ResidualStack.dropout_mask``
    (one bit per element). Generated OUTSIDE shard_map so pjit partitions
    the counter-based generation along T."""
    tw = (T + 31) // 32
    words = jax.random.bits(
        key, (num_stages, num_layers, tw, 1, channels), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape(1, 1, 1, 32, 1)
    bits = ((words >> shifts) & jnp.uint32(1)).astype(jnp.uint8)
    return bits.reshape(num_stages, num_layers, tw * 32, channels)[:, :, :T]


def make_sp_tecno_train_step(mesh: Mesh, optimizer, *, num_stages: int,
                             num_layers: int, channels: int,
                             axis_name: str = "data",
                             dropout_rate: float = 0.5):
    """Build a jitted SP training step over ``mesh``.

    step(params, opt_state, key, x, labels, mask) -> (params, opt_state,
    loss): ``x`` (T, C_in), ``labels``/``mask`` (T,) live sharded along T
    over ``axis_name``; params/optimizer state are replicated. One psum
    pair for the loss, one grad psum — everything else is shard-local.
    """
    if dropout_rate not in (0.0, 0.5):
        # fail at build time, not at the first traced step: the bit-packed
        # mask scheme (one threefry bit per element) is specialized to the
        # reference rate 0.5
        raise NotImplementedError(
            f"SP dropout supports rate 0.5 (reference) or 0.0, got "
            f"{dropout_rate}")
    pspec = P(axis_name)

    def local_value_and_grad(params, x, labels, mask, masks):
        # no grad psum: the loss psum's transpose already sums every
        # shard's cotangent into each device's grad (see module docstring)
        return jax.value_and_grad(sp_tecno_loss)(
            params, x, labels, mask, num_stages=num_stages,
            axis_name=axis_name, masks=masks, dropout_rate=dropout_rate,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, x, labels, mask):
        T = x.shape[0]
        masks = None
        if dropout_rate == 0.5:
            masks = sp_dropout_masks(
                key, num_stages=num_stages, num_layers=num_layers, T=T,
                channels=channels)
            masks = lax.with_sharding_constraint(
                masks, NamedSharding(mesh, P(None, None, axis_name)))
        loss, grads = jax.shard_map(
            local_value_and_grad,
            mesh=mesh,
            # a None masks arg is an empty pytree: any leaf spec fits
            in_specs=(P(), pspec, pspec, pspec, P(None, None, axis_name)),
            out_specs=(P(), P()),
        )(params, x, labels, mask, masks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def shard_sequence(arr, mesh: Mesh, axis_name: str = "data"):
    """Place a (T, ...) array sharded along T over ``axis_name``."""
    return jax.device_put(
        arr, NamedSharding(mesh, P(axis_name, *([None] * (arr.ndim - 1)))))
