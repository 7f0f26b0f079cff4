"""Pipeline parallelism (PP) over the multi-stage TCN refinement chain.

TeCNo / the COG fast path refine logits through a chain of identical
stages (stage s consumes ``softmax`` of stage s-1's logits — reference
models_TCN.py:17-101, models_COG.py:482-524). That chain is a natural
pipeline: put stage s's params on device s and stream TRIALS through as
microbatches — a scaling axis the reference's batch_size=1 loop cannot
express, and orthogonal to DP (trials), SP (time) and TP (FE width).

TPU-first schedule (the scaling-book collective-program form — no
send/recv loops, no per-stage processes):

- stage params live STACKED (R, ...) and sharded over the mesh axis, so
  device d holds exactly stage d's weights;
- ONE ``lax.scan`` over ``M + R - 1`` pipeline steps runs inside
  ``jax.shard_map``: at step j device d applies its stage to microbatch
  ``j - d``, then the activations rotate one hop right via `lax.ppermute`
  (ICI neighbor transfer, (T, C) logits — tiny);
- device 0 injects microbatch j at step j; device d's step-j output IS
  stage d's logits for microbatch j-d, so the scan's stacked outputs hold
  every (stage, microbatch) pair — the multi-stage loss needs all of them
  (CE averages across stages);
- the pipeline bubble is the usual (R-1)/(M+R-1) idle fraction; feed
  M >> R microbatches to amortize;
- **backward**: ``jax.grad`` straight through the scan — the transpose of
  the forward rotation is the reverse rotation, so the pipelined backward
  schedule falls out of XLA's autodiff; no hand-written bwd pass. Grads
  arrive sharded per stage like the params.

Dropout (reference ``models_TCN.py:104-137``, rate 0.5 after each block's
conv1x1) is supported through a deterministic key convention: the mask for
(global stage ``s``, microbatch ``m``) is drawn from
``fold_in(fold_in(key, s), m)``, so device d can generate exactly its
stage's masks inside the rotation with no mask traffic, and a sequential
comparator using the same convention reproduces the pipelined step
bit-for-bit (tests/test_pipeline.py::test_pp_train_step_dropout_matches_
sequential). Exact parity with the sequential stage loop is pinned in
tests/test_pipeline.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _stage_apply(p, x, dropout_mask=None, keep: float = 1.0):
    """SingleStageTCN (models/layers.py) forward on one (T, C_in) block:
    conv1x1 in -> dilated residual stack -> conv1x1 out. ``dropout_mask``
    (L, T, C) keep-bits applies the reference's post-conv1x1 dropout
    (models_TCN.py:104-137) with inverted 1/keep scaling — same placement
    as models/layers.py::ResidualStack."""
    ci = p["conv_in"]["Conv_0"]
    h = x @ ci["kernel"][0] + ci["bias"]
    st = p["stack"]
    L = st["w3"].shape[0]
    T = h.shape[0]
    for i in range(L):
        d = 2 ** i
        hp = jnp.pad(h, ((2 * d, 0), (0, 0)))
        y = (hp[:T] @ st["w3"][i, 0] + hp[d : d + T] @ st["w3"][i, 1]
             + hp[2 * d : 2 * d + T] @ st["w3"][i, 2] + st["b3"][i])
        y = jax.nn.relu(y) @ st["w1"][i] + st["b1"][i]
        if dropout_mask is not None:
            y = y * dropout_mask[i].astype(y.dtype) / keep
        h = h + y
    co = p["conv_out"]["Conv_0"]
    return h @ co["kernel"][0] + co["bias"]


def _stage_dropout_mask(key, s, m, L, T, C, rate):
    """The (L, T, C) keep-mask for (global stage s, microbatch m) — THE
    pipeline dropout convention: device-local regeneration from the folded
    key, identical for the pipelined and sequential schedules."""
    k = jax.random.fold_in(jax.random.fold_in(key, s), m)
    return jax.random.bernoulli(k, 1.0 - rate, (L, T, C))


def stack_stage_params(params, num_stages: int, first: int = 1):
    """Stack TeCNo's per-stage trees ``stage{first}..stage{num_stages-1}``
    into one tree with a leading stage axis (the pipeline's sharded
    layout). All refinement stages share shapes (conv_in is (2, f))."""
    trees = [params[f"stage{s}"] for s in range(first, num_stages)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def pipeline_refine(stacked_params, logits0, mesh: Mesh,
                    axis_name: str = "data",
                    dropout_key=None, dropout_rate: float = 0.0):
    """Run R refinement stages over M microbatches as one pipelined
    program.

    stacked_params: per-stage trees stacked (R, ...), R = mesh axis size;
    logits0 (M, T, C): stage-0 output logits per microbatch (trial).
    dropout_key: optional PRNG key; device d regenerates its own stage's
    (L, T, C) keep-masks inside the rotation via
    :func:`_stage_dropout_mask` (global stage d+1, microbatch j-d) — no
    mask traffic, deterministic across schedules.
    Returns (R, M, T, C): every refinement stage's logits for every
    microbatch (stage r of the chain = global stage ``first + r``).
    """
    R = int(mesh.shape[axis_name])
    M, T, C = logits0.shape

    def worker(p_local, l0, kd):
        p = jax.tree.map(lambda a: a[0], p_local)  # (1, ...) -> stage tree
        d = lax.axis_index(axis_name)
        steps = M + R - 1
        perm = [(i, i + 1) for i in range(R - 1)]

        def body(buf, j):
            # device 0 injects microbatch j; downstream devices consume
            # the rotated buffer (stage d-1's logits for microbatch j-d)
            inj = l0[jnp.clip(j, 0, M - 1)]
            inp = jnp.where(d == 0, inj, buf)
            x = jax.nn.softmax(inp, axis=-1)
            if kd is None:
                out = _stage_apply(p, x)
            else:
                st = p["stack"]
                mask = _stage_dropout_mask(
                    jax.random.wrap_key_data(kd), d + 1,
                    jnp.clip(j - d, 0, M - 1), st["w3"].shape[0], T,
                    st["w1"].shape[-1], dropout_rate)
                out = _stage_apply(p, x, mask, 1.0 - dropout_rate)
            nxt = lax.ppermute(out, axis_name, perm) if R > 1 else out
            return nxt, out

        # the rotated carry is device-VARYING; mark the initial zeros so
        # the scan's carry types match (shard_map VMA tracking)
        buf0 = lax.pcast(jnp.zeros((T, C), logits0.dtype),
                         (axis_name,), to="varying")
        _, outs = lax.scan(body, buf0, jnp.arange(steps))
        return outs[None]  # (1, steps, T, C) -> gathered (R, steps, T, C)

    if dropout_key is None:
        outs = jax.shard_map(
            functools.partial(worker, kd=None), mesh=mesh,
            in_specs=(P(axis_name), P()), out_specs=P(axis_name),
        )(stacked_params, logits0)
    else:
        # the raw key words ride in replicated (extended PRNG dtypes and
        # shard_map specs don't mix); re-wrapped device-side
        outs = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(axis_name), P(), P()), out_specs=P(axis_name),
        )(stacked_params, logits0, jax.random.key_data(dropout_key))
    # device (stage) s's step-(m+s) output is microbatch m's stage-s logits
    idx = jnp.arange(M)[None, :] + jnp.arange(R)[:, None]  # (R, M)
    return jnp.take_along_axis(
        outs, idx[:, :, None, None], axis=1)


def shard_stage_params(stacked_params, mesh: Mesh, axis_name: str = "data"):
    """Place stacked stage trees with the stage axis sharded."""
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))))
    return jax.tree.map(put, stacked_params)


def make_pp_tecno_train_step(mesh: Mesh, optimizer,
                             axis_name: str = "data",
                             dropout_rate: float = 0.0):
    """Pipelined TeCNo TRAINING step: the multi-stage objective of
    reference ``models_TCN.py:17-101`` / ``modeling_utils.py:278-297``
    driven through the pipeline schedule, with an optimizer update from the
    stage-sharded gradients.

    - stage 0 runs replicated over the M microbatch trials (its params are
      small and every microbatch needs it first — the natural DP tier);
    - stages 1..R stream through :func:`pipeline_refine`; ``jax.grad``
      transposes the rotation, so gradients arrive SHARDED per stage,
      exactly like the params — the optimizer update is shard-local;
    - the loss is the reference's stage-averaged soft CE over ALL stages
      (train/losses.py::tecno_stage_loss), so every (stage, microbatch)
      logit the pipeline emits is consumed.

    ``dropout_rate > 0`` applies the reference's training dropout through
    the per-(stage, microbatch) key convention (module docstring): the
    returned step then takes a trailing PRNG ``key`` argument, and
    equality with a sequential comparator drawing the same masks is pinned
    by tests/test_pipeline.py::test_pp_train_step_dropout_matches_
    sequential. At rate 0 the signature (and parity,
    ::test_pp_train_step_matches_sequential) is unchanged.

    step(stage0, stacked, opt0, opt_r, x, labels, mask[, key]) ->
    (stage0, stacked, opt0, opt_r, loss): ``stage0`` the stage-0 tree
    (replicated), ``stacked`` the (R, ...) refinement trees sharded via
    :func:`shard_stage_params`, ``x`` (M, T, C_in), labels/mask (M, T).
    """
    import optax

    from ..train.losses import tecno_stage_loss

    def loss_fn(stage0, stacked, x, labels, mask, key):
        if key is None:
            out0 = jax.vmap(functools.partial(_stage_apply, stage0))(x)
            outs = pipeline_refine(stacked, out0, mesh, axis_name)
        else:
            st = stage0["stack"]
            L, C = st["w3"].shape[0], st["w1"].shape[-1]
            M, T = x.shape[0], x.shape[1]
            masks0 = jax.vmap(lambda m: _stage_dropout_mask(
                key, 0, m, L, T, C, dropout_rate))(jnp.arange(M))
            out0 = jax.vmap(lambda xm, mk: _stage_apply(
                stage0, xm, mk, 1.0 - dropout_rate))(x, masks0)
            outs = pipeline_refine(stacked, out0, mesh, axis_name,
                                   dropout_key=key,
                                   dropout_rate=dropout_rate)
        logits = jnp.concatenate([out0[None], outs], axis=0)  # (S, M, T, C)
        return tecno_stage_loss(logits, labels, mask)

    def _update(stage0, stacked, opt0, opt_r, x, labels, mask, key):
        loss, (g0, gr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(stage0, stacked, x, labels, mask, key)
        u0, opt0 = optimizer.update(g0, opt0, stage0)
        ur, opt_r = optimizer.update(gr, opt_r, stacked)
        return (optax.apply_updates(stage0, u0),
                optax.apply_updates(stacked, ur), opt0, opt_r, loss)

    if dropout_rate > 0.0:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def step(stage0, stacked, opt0, opt_r, x, labels, mask, key):
            return _update(stage0, stacked, opt0, opt_r, x, labels, mask,
                           key)
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def step(stage0, stacked, opt0, opt_r, x, labels, mask):
            return _update(stage0, stacked, opt0, opt_r, x, labels, mask,
                           None)

    return step
