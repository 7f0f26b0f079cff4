"""Sequence-parallel TransSVNet (parallel/sp_tsvn.py): forward, loss and
gradients on the 8-device mesh vs the single-chip module + engine
objective."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from med_tpu.models.tcn import TeCNo
from med_tpu.models.transsvnet import TransSVNet
from med_tpu.parallel import make_mesh
from med_tpu.parallel.seqpar import shard_sequence
from med_tpu.parallel.sp_tsvn import sp_tsvn_forward, sp_tsvn_loss
from med_tpu.train import losses

T, C_IN, F_MAPS, LEN_Q, N_STAGES = 256, 12, 8, 6, 2


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices())


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, T, C_IN)), jnp.float32)
    tecno = TeCNo(num_stages=N_STAGES, num_layers=3, f_maps=F_MAPS,
                  in_dim=C_IN, out_classes=2, fused=False)
    tp = tecno.init({"params": jax.random.key(0)}, x,
                    train=False)["params"]
    tsvn = TransSVNet(f_maps=F_MAPS, out_classes=2, len_q=LEN_Q,
                      in_dim=C_IN, packed=False)
    logits0 = tecno.apply({"params": tp}, x, train=False)[-1]
    sp = tsvn.init({"params": jax.random.key(1)}, logits0, x,
                   train=False)["params"]
    labels = jnp.asarray(rng.integers(0, 2, T), jnp.int32)
    return tecno, tp, tsvn, sp, x, logits0, labels


def test_sp_tsvn_forward_matches_module(mesh, setup):
    _, _, tsvn, sp, x, logits0, _ = setup
    ref = np.asarray(tsvn.apply({"params": sp}, logits0, x, train=False))[0]

    fwd = functools.partial(sp_tsvn_forward, len_q=LEN_Q, f_maps=F_MAPS,
                            axis_name="data")
    got = jax.jit(jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P("data")))(sp, logits0[0], x[0])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_sp_tsvn_loss_and_grads_match_engine(mesh, setup):
    tecno, tp, tsvn, sp, x, _, labels = setup
    mask = jnp.asarray((np.arange(T) < T - 9), jnp.float32)

    def ref_loss(params):
        tl = jax.lax.stop_gradient(
            tecno.apply({"params": tp}, jax.lax.stop_gradient(x),
                        train=False)[-1])
        out = tsvn.apply({"params": params}, tl, x, train=False)
        y = labels[None].astype(out.dtype)
        targets = jnp.stack([1.0 - y, y], axis=-1)
        return losses.soft_cross_entropy(out, targets, mask[None])

    ref_l, ref_g = jax.value_and_grad(ref_loss)(sp)

    def local(params, frozen, xs, ys, ms):
        return jax.value_and_grad(sp_tsvn_loss)(
            params, frozen, xs, ys, ms, num_stages=N_STAGES, len_q=LEN_Q,
            f_maps=F_MAPS, axis_name="data")

    got_l, got_g = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P())))(
        sp, tp, x[0], shard_sequence(labels, mesh),
        shard_sequence(mask, mesh))

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    # at init the unlearned output LN leaves only ~1e-5-magnitude grads,
    # so the comparison is absolute-dominated (measured SP-vs-single-chip
    # diffs <= 6e-7 — f32 reduction-order noise on a 6e-8-exact forward)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_g),
        jax.tree_util.tree_leaves_with_path(got_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-6,
            err_msg=jax.tree_util.keystr(pa))
