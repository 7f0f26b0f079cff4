"""Sequence parallelism (parallel/seqpar.py): the frame-family time axis
sharded over an 8-device mesh must reproduce the single-chip math exactly
— distributed causal shifts, SP TeCNo forward, global masked loss, and the
psum'd gradient."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from med_tpu.models.tcn import TeCNo
from med_tpu.parallel import make_mesh
from med_tpu.parallel.seqpar import (
    make_sp_tecno_train_step,
    seq_shift_right,
    shard_sequence,
    sp_dropout_masks,
    sp_residual_stack,
    sp_tecno_forward,
    sp_tecno_loss,
)
from med_tpu.train.losses import tecno_stage_loss


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices())


def _run_sharded(mesh, fn, in_specs, out_specs, *args):
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs))(*args)


@pytest.mark.parametrize("offset", [0, 1, 7, 32, 33, 64, 100, 256, 300])
def test_seq_shift_right(mesh, rng, offset):
    T, C = 256, 4
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
    got = _run_sharded(
        mesh,
        functools.partial(seq_shift_right, offset=offset, axis_name="data"),
        (P("data"),), P("data"), shard_sequence(x, mesh))
    ref = np.zeros((T, C), np.float32)
    if offset < T:
        ref[offset:] = np.asarray(x)[: T - offset]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=0)


def _tiny_tecno(rng, num_stages=3, num_layers=7, f_maps=8, in_dim=12):
    model = TeCNo(num_stages=num_stages, num_layers=num_layers,
                  f_maps=f_maps, in_dim=in_dim, out_classes=2, fused=False)
    T = 256
    x = jnp.asarray(rng.normal(size=(1, T, in_dim)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x,
                        train=False)["params"]
    return model, params, x


def test_sp_forward_matches_single_chip(mesh, rng):
    """SP TeCNo forward (no dropout) == TeCNo.apply(train=False): the
    distributed shifts reproduce the causal left-pad bit-for-bit (the
    dilations reach 2^6, so taps span up to 4 of the 8 shards)."""
    model, params, x = _tiny_tecno(rng)
    ref = np.asarray(model.apply({"params": params}, x, train=False))[:, 0]

    got = _run_sharded(
        mesh,
        functools.partial(sp_tecno_forward, num_stages=3, axis_name="data"),
        (P(), P("data")), P(None, "data"),
        params, shard_sequence(x[0], mesh))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)


def test_sp_loss_and_grads_match_single_chip(mesh, rng):
    """Global masked stage loss + psum'd grads == jax.grad of the
    single-chip tecno_stage_loss (dropout off isolates the distributed
    backward: ppermute transposes + loss psums)."""
    model, params, x = _tiny_tecno(rng)
    T = x.shape[1]
    labels = jnp.asarray(rng.integers(0, 2, T), jnp.int32)
    mask = jnp.asarray((np.arange(T) < T - 17), jnp.float32)  # padded tail

    def ref_loss(p):
        out = model.apply({"params": p}, x, train=False)
        return tecno_stage_loss(out, labels[None], mask[None])

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

    def local(p, xs, ys, ms):
        # no grad psum: the loss psum's transpose already delivers the
        # global gradient replicated on every device (seqpar docstring)
        return jax.value_and_grad(sp_tecno_loss)(
            p, xs, ys, ms, num_stages=3, axis_name="data",
            masks=None, dropout_rate=0.0)

    got_l, got_g = _run_sharded(
        mesh, local, (P(), P("data"), P("data"), P("data")), (P(), P()),
        params, shard_sequence(x[0], mesh),
        shard_sequence(labels, mesh), shard_sequence(mask, mesh))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_g),
        jax.tree_util.tree_leaves_with_path(got_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa))


def test_sp_dropout_forward_matches_masked_oracle(mesh, rng):
    """SP forward with explicit global dropout masks == a literal
    single-chip oracle applying the same masks (pins the train path's
    mask plumbing and 1/keep scaling)."""
    num_stages, L, C_in, C = 2, 5, 12, 8
    model = TeCNo(num_stages=num_stages, num_layers=L, f_maps=C,
                  in_dim=C_in, out_classes=2, fused=False)
    T = 256
    x = jnp.asarray(rng.normal(size=(1, T, C_in)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x,
                        train=False)["params"]
    masks = np.asarray(
        sp_dropout_masks(jax.random.key(1), num_stages=num_stages,
                         num_layers=L, T=T, channels=C))

    # literal oracle: the ResidualStack XLA loop with these masks
    def oracle_stage(sp, h, m):
        h = h @ sp["conv_in"]["Conv_0"]["kernel"][0] + sp["conv_in"]["Conv_0"]["bias"]
        st = sp["stack"]
        for i in range(L):
            d = 2 ** i
            hp = np.pad(np.asarray(h), ((2 * d, 0), (0, 0)))
            y = (hp[: T] @ st["w3"][i, 0] + hp[d : d + T] @ st["w3"][i, 1]
                 + hp[2 * d : 2 * d + T] @ st["w3"][i, 2] + st["b3"][i])
            y = np.maximum(y, 0.0) @ st["w1"][i] + st["b1"][i]
            y = y * m[i] * 2.0
            h = h + y
        return h @ sp["conv_out"]["Conv_0"]["kernel"][0] + sp["conv_out"]["Conv_0"]["bias"]

    h = np.asarray(x[0])
    ref = []
    p_np = jax.tree.map(np.asarray, params)
    logits = oracle_stage(p_np["stage0"], h, masks[0])
    ref.append(logits)
    for s in range(1, num_stages):
        logits = oracle_stage(
            p_np[f"stage{s}"], np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)),
            masks[s])
        ref.append(logits)
    ref = np.stack(ref)

    got = _run_sharded(
        mesh,
        lambda p, xs, ms: sp_tecno_forward(
            p, xs, num_stages=num_stages, axis_name="data", masks=ms,
            dropout_rate=0.5),
        (P(), P("data"), P(None, None, "data")), P(None, "data"),
        params, shard_sequence(x[0], mesh),
        jax.device_put(jnp.asarray(masks),
                       jax.sharding.NamedSharding(mesh, P(None, None, "data"))))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_sp_train_step_learns(mesh, rng):
    """The full jitted SP train step (dropout masks generated sharded,
    Adam outside shard_map) runs and reduces the loss."""
    num_stages, L, C = 2, 5, 8
    model = TeCNo(num_stages=num_stages, num_layers=L, f_maps=C,
                  in_dim=12, out_classes=2, fused=False)
    T = 256
    x = jnp.asarray(rng.normal(size=(1, T, 12)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x,
                        train=False)["params"]
    labels = jnp.asarray(rng.integers(0, 2, T), jnp.int32)
    mask = jnp.ones(T, jnp.float32)

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_sp_tecno_train_step(
        mesh, tx, num_stages=num_stages, num_layers=L, channels=C)
    xs = shard_sequence(x[0], mesh)
    ys = shard_sequence(labels, mesh)
    ms = shard_sequence(mask, mesh)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, jax.random.key(100 + i), xs, ys, ms)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
