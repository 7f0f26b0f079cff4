"""Pipeline parallelism (parallel/pipeline.py): the GPipe-style ppermute
rotation over TeCNo refinement stages must reproduce the sequential stage
chain exactly — forward (vs the flax module) and gradients (through the
scan + rotation transpose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from med_tpu.models.tcn import TeCNo
from med_tpu.parallel import make_mesh
from med_tpu.parallel.pipeline import (
    _stage_apply,
    pipeline_refine,
    shard_stage_params,
    stack_stage_params,
)

S_TOTAL = 5   # stage0 + 4 refinement stages = data-axis size of the mesh
M, T, C_IN = 6, 64, 12


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices())


@pytest.fixture(scope="module")
def tecno(rng_module=np.random.default_rng(3)):
    model = TeCNo(num_stages=S_TOTAL, num_layers=3, f_maps=8, in_dim=C_IN,
                  out_classes=2, fused=False)
    x = jnp.asarray(rng_module.normal(size=(M, T, C_IN)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x[:1],
                        train=False)["params"]
    return model, params, x


def test_pipeline_matches_module_chain(mesh, tecno):
    """pipeline_refine(stage-0 logits) == the flax TeCNo's own later-stage
    logits, for every (stage, microbatch) pair."""
    model, params, x = tecno
    R = int(mesh.shape["data"])
    assert R == S_TOTAL - 1, "test expects a 4-wide data axis"

    ref = np.stack([  # (S, M, T, 2): per-trial module forward
        np.asarray(model.apply({"params": params}, x[m : m + 1],
                               train=False))[:, 0]
        for m in range(M)
    ], axis=1)
    logits0 = jnp.asarray(ref[0])

    stacked = shard_stage_params(
        stack_stage_params(params, S_TOTAL), mesh)
    got = jax.jit(lambda p, l0: pipeline_refine(p, l0, mesh))(
        stacked, logits0)
    assert got.shape == (R, M, T, 2)
    np.testing.assert_allclose(np.asarray(got), ref[1:], rtol=1e-5,
                               atol=1e-6)


def test_pipeline_grads_match_sequential(mesh, tecno):
    """Gradients THROUGH the pipelined scan (rotation transposes) equal
    the sequential refinement chain's gradients."""
    model, params, x = tecno
    R = int(mesh.shape["data"])
    out0 = model.apply({"params": params}, x, train=False)[0]  # (M, T, 2)
    labels = jnp.asarray(
        np.random.default_rng(5).integers(0, 2, (M, T)), jnp.int32)

    def ce(logits, lbl):  # logits (T, 2), lbl (T,): mean CE
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, lbl[:, None], axis=-1))

    stacked = stack_stage_params(params, S_TOTAL)

    def seq_loss(stk):
        total = 0.0
        for m in range(M):
            l = out0[m]
            for s in range(R):
                p = jax.tree.map(lambda a: a[s], stk)
                l = _stage_apply(p, jax.nn.softmax(l, axis=-1))
                total += ce(l, labels[m])
        return total / (M * R)

    def pipe_loss(stk):
        outs = pipeline_refine(stk, out0, mesh)  # (R, M, T, 2)
        per = jax.vmap(jax.vmap(ce, in_axes=(0, 0)),
                       in_axes=(0, None))(outs, labels)
        return jnp.mean(per)

    ref_l, ref_g = jax.value_and_grad(seq_loss)(stacked)
    got_l, got_g = jax.jit(jax.value_and_grad(pipe_loss))(
        shard_stage_params(stacked, mesh))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_g),
        jax.tree_util.tree_leaves_with_path(got_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa))


def test_pp_train_step_matches_sequential(mesh, tecno):
    """The pipelined TRAIN step (stage-0 replicated + stages 1..R on the
    pipeline, Adam on the stage-sharded grads) reproduces the sequential
    single-device step on the same dropout-free objective: per-step losses
    and the updated params after 2 Adam steps."""
    import optax

    from med_tpu.parallel.pipeline import make_pp_tecno_train_step
    from med_tpu.train.losses import tecno_stage_loss

    model, params, x = tecno
    # the pp step donates its param args — work on copies so the
    # module-scoped fixture tree survives for later tests
    params = jax.tree.map(jnp.array, params)
    rng = np.random.default_rng(5)
    labels = jnp.asarray(rng.integers(0, 2, (M, T)), jnp.int32)
    mask = jnp.asarray((rng.random((M, T)) < 0.9).astype(np.float32))
    tx = optax.adam(1e-3)

    def ref_loss(p):
        outs = model.apply({"params": p}, x, train=False)  # (S, M, T, 2)
        return tecno_stage_loss(outs, labels, mask)

    @jax.jit
    def ref_step(p, o):
        loss, g = jax.value_and_grad(ref_loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    ref_params, ref_opt = params, tx.init(params)
    ref_losses = []
    for _ in range(2):
        ref_params, ref_opt, rl = ref_step(ref_params, ref_opt)
        ref_losses.append(float(rl))

    stage0 = params["stage0"]
    stacked = shard_stage_params(stack_stage_params(params, S_TOTAL), mesh)
    opt0, opt_r = tx.init(stage0), tx.init(stacked)
    step = make_pp_tecno_train_step(mesh, tx)
    pp_losses = []
    for _ in range(2):
        stage0, stacked, opt0, opt_r, loss = step(
            stage0, stacked, opt0, opt_r, x, labels, mask)
        pp_losses.append(float(loss))
    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-6)

    def cmp(ref_tree, got_tree, tag):
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_tree),
            jax.tree_util.tree_leaves_with_path(got_tree),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                err_msg=tag + jax.tree_util.keystr(pa))

    cmp(ref_params["stage0"], stage0, "stage0")
    for s in range(1, S_TOTAL):
        cmp(ref_params[f"stage{s}"],
            jax.tree.map(lambda a: a[s - 1], stacked), f"stage{s}")


def test_pp_train_step_dropout_matches_sequential(mesh, tecno):
    """The pipelined train step WITH dropout (rate 0.5, reference
    models_TCN.py:104-137) equals a sequential comparator drawing the
    identical per-(stage, microbatch) masks through the key convention
    (_stage_dropout_mask): losses and updated params after 2 Adam steps."""
    import optax

    from med_tpu.parallel.pipeline import (
        _stage_dropout_mask,
        make_pp_tecno_train_step,
    )
    from med_tpu.train.losses import tecno_stage_loss

    model, params, x = tecno
    params = jax.tree.map(jnp.array, params)  # donation-safe copy
    R = int(mesh.shape["data"])
    rng = np.random.default_rng(11)
    labels = jnp.asarray(rng.integers(0, 2, (M, T)), jnp.int32)
    mask = jnp.asarray((rng.random((M, T)) < 0.9).astype(np.float32))
    tx = optax.adam(1e-3)
    RATE = 0.5
    L = params["stage0"]["stack"]["w3"].shape[0]
    C = params["stage0"]["stack"]["w1"].shape[-1]

    def ref_loss(p, key):
        per_stage = []
        for m in range(M):
            l = _stage_apply(p["stage0"], x[m],
                             _stage_dropout_mask(key, 0, m, L, T, C, RATE),
                             1.0 - RATE)
            chain = [l]
            for s in range(1, S_TOTAL):
                l = _stage_apply(
                    p[f"stage{s}"], jax.nn.softmax(l, axis=-1),
                    _stage_dropout_mask(key, s, m, L, T, C, RATE),
                    1.0 - RATE)
                chain.append(l)
            per_stage.append(jnp.stack(chain))  # (S, T, 2)
        logits = jnp.stack(per_stage, axis=1)  # (S, M, T, 2)
        return tecno_stage_loss(logits, labels, mask)

    @jax.jit
    def ref_step(p, o, key):
        loss, g = jax.value_and_grad(ref_loss)(p, key)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    keys = [jax.random.key(100 + i) for i in range(2)]
    ref_params, ref_opt = params, tx.init(params)
    ref_losses = []
    for k in keys:
        ref_params, ref_opt, rl = ref_step(ref_params, ref_opt, k)
        ref_losses.append(float(rl))

    stage0 = params["stage0"]
    stacked = shard_stage_params(stack_stage_params(params, S_TOTAL), mesh)
    opt0, opt_r = tx.init(stage0), tx.init(stacked)
    step = make_pp_tecno_train_step(mesh, tx, dropout_rate=RATE)
    pp_losses = []
    for k in keys:
        stage0, stacked, opt0, opt_r, loss = step(
            stage0, stacked, opt0, opt_r, x, labels, mask, k)
        pp_losses.append(float(loss))
    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-6)

    def cmp(ref_tree, got_tree, tag):
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_tree),
            jax.tree_util.tree_leaves_with_path(got_tree),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                err_msg=tag + jax.tree_util.keystr(pa))

    cmp(ref_params["stage0"], stage0, "stage0")
    for s in range(1, S_TOTAL):
        cmp(ref_params[f"stage{s}"],
            jax.tree.map(lambda a: a[s - 1], stacked), f"stage{s}")
