"""Sequence-parallel COG (parallel/sp_cog.py): forward, loss and gradients
on an 8-device mesh must reproduce the single-chip COG exactly (dropout
off; the train path's mask plumbing is pinned in test_seqpar.py's scheme)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from med_tpu.models.cog import COG
from med_tpu.parallel import make_mesh
from med_tpu.parallel.seqpar import shard_sequence
from med_tpu.parallel.sp_cog import sp_cog_forward, sp_cog_loss
from med_tpu.train import losses

NUM_R = 2
LEN_Q = 6
CFG = dict(num_layers_basic=4, num_layers_r=3, num_r=NUM_R, f_maps=8,
           f_dim=12, out_classes=2, d_model=16, d_q=2, len_q=LEN_Q,
           use_pallas=False, fused=False)
T = 256
SMOOTH = 0.15


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices())


@pytest.fixture(scope="module")
def cog():
    rng = np.random.default_rng(7)
    model = COG(**CFG)
    x = jnp.asarray(rng.normal(size=(1, T, CFG["f_dim"])), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    labels = jnp.asarray(rng.integers(0, 2, T), jnp.int32)
    return model, variables, x, labels


def test_sp_cog_forward_matches_single_chip(mesh, cog):
    model, variables, x, _ = cog
    ref_out, _ = model.apply(variables, x, train=False)

    fwd = functools.partial(
        sp_cog_forward, num_r=NUM_R, len_q=LEN_Q, axis_name="data")
    got = jax.jit(jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=[P("data")] * len(ref_out),
    ))(variables["params"], variables["constants"], x[0])

    # (1 + num_r) slow FPN tracks + (1 + num_r) fast tracks
    assert len(got) == len(ref_out) == 2 * (1 + NUM_R)
    for i, (a, b) in enumerate(zip(ref_out, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a)[0], rtol=2e-5, atol=2e-5,
            err_msg=f"track {i}")


@pytest.mark.parametrize("width", [5, 32, 48, 80])
def test_halo_left_multi_hop(mesh, width):
    """halo_left at any width (incl. > T_local, spanning several left
    neighbors): shard i's halo equals global rows [i*S - w, i*S), with the
    fill row where the global index is negative."""
    from med_tpu.parallel.sp_cog import halo_left

    n = int(mesh.shape["data"])
    S = 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n * S, 4)), jnp.float32)
    fill = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

    got = jax.jit(jax.shard_map(
        lambda b: halo_left(b, width, "data", fill_row=fill),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    ))(x)
    got = np.asarray(got).reshape(n, width, 4)

    xp = np.concatenate(
        [np.broadcast_to(np.asarray(fill), (width, 4)), np.asarray(x)])
    for i in range(n):
        np.testing.assert_allclose(
            got[i], xp[i * S : i * S + width], rtol=1e-6,
            err_msg=f"shard {i}")


def test_sp_cog_loss_and_grads_match_single_chip(mesh, cog):
    model, variables, x, labels = cog
    constants = variables["constants"]
    true_len = jnp.asarray(T, jnp.int32)

    def ref_loss(params):
        out_list, _ = model.apply(
            {"params": params, "constants": constants}, x, train=False)
        ce_total, sm_total = 0.0, 0.0
        for track in out_list:
            ce, sm = losses.cog_track_loss(track, labels, true_len, SMOOTH)
            ce_total += ce
            sm_total += sm
        n = len(out_list)
        return ce_total / n + SMOOTH * (sm_total / n)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(variables["params"])

    def local(params, consts, xs, ys):
        return jax.value_and_grad(sp_cog_loss)(
            params, consts, xs, ys, num_r=NUM_R, len_q=LEN_Q,
            smooth_lambda=SMOOTH, axis_name="data")

    got_l, got_g = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P(), P()),
    ))(variables["params"], constants, x[0],
       shard_sequence(labels, mesh))

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_g),
        jax.tree_util.tree_leaves_with_path(got_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))


def test_sp_cog_pallas_kernel_under_shard_map(mesh, cog):
    """use_pallas=True (interpret mode off-TPU): the PACKED Pallas
    attention kernel — custom VJP included — composes with shard_map.
    Forward, loss and gradients match the single-chip model within kernel
    numerics (the kernel pads T to tile multiples; f32 on CPU).

    check_vma=False: the kernels declare their output VMA
    (ops/attention.py::_vma_of) which real lowering needs, but the
    INTERPRET-mode HLO interpreter still trips on mixed-VMA dynamic_slice
    inside the discharged kernel jaxpr — a JAX limitation whose suggested
    workaround is exactly this flag (the real-TPU mesh-of-1 smoke runs
    with full VMA checking, scripts/tpu_sp_smoke.py).

    Disabling VMA changes shard_map's grad-accumulation semantics for ANY
    body (the loss psum's transpose no longer auto-sums cotangents:
    measured 0.09 max grad diff for the pure-XLA body too), so gradients
    are pinned pallas-vs-XLA under the SAME check_vma=False shard_map —
    isolating exactly the kernel composition — while
    test_sp_cog_loss_and_grads_match_single_chip closes the XLA-vs-ref
    link with full VMA checking."""
    model, variables, x, labels = cog
    constants = variables["constants"]
    ref_out, _ = model.apply(variables, x, train=False)

    fwd = functools.partial(
        sp_cog_forward, num_r=NUM_R, len_q=LEN_Q, axis_name="data",
        use_pallas=True, interpret=True)
    got = jax.jit(jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=[P("data")] * len(ref_out), check_vma=False,
    ))(variables["params"], constants, x[0])
    for i, (a, b) in enumerate(zip(ref_out, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a)[0], rtol=2e-4, atol=2e-4,
            err_msg=f"track {i}")

    def run(use_pallas, interpret):
        def local(params, consts, xs, ys):
            return jax.value_and_grad(sp_cog_loss)(
                params, consts, xs, ys, num_r=NUM_R, len_q=LEN_Q,
                smooth_lambda=SMOOTH, axis_name="data",
                use_pallas=use_pallas, interpret=interpret)

        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=(P(), P()), check_vma=False,
        ))(variables["params"], constants, x[0],
           shard_sequence(labels, mesh))

    pallas_l, pallas_g = run(True, True)
    xla_l, xla_g = run(False, None)
    np.testing.assert_allclose(float(pallas_l), float(xla_l), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(xla_g),
        jax.tree_util.tree_leaves_with_path(pallas_g),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))


def test_sp_cog_train_step_learns(mesh, cog):
    """Full SP COG training: dropout masks generated globally + sharded,
    Adam on the replicated params; the loss decreases."""
    import optax

    from med_tpu.parallel.sp_cog import sp_cog_dropout

    model, variables, x, labels = cog
    params = variables["params"]
    constants = variables["constants"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def local(params, consts, xs, ys, dp):
        return jax.value_and_grad(sp_cog_loss)(
            params, consts, xs, ys, num_r=NUM_R, len_q=LEN_Q,
            smooth_lambda=SMOOTH, axis_name="data", dropout=dp)

    dp_specs = {
        "ch_TCN": P(), "ch_fast": P(),
        "TCN": P(None, "data"), "fast_stage1": P(None, "data"),
    }
    for r in range(NUM_R):
        dp_specs[f"R{r}"] = P(None, "data")
        dp_specs[f"fast_R{r}"] = P(None, "data")

    @jax.jit
    def step(params, opt_state, key, xs, ys):
        dp = sp_cog_dropout(
            key, T=T, channels=CFG["f_maps"],
            num_layers_basic=CFG["num_layers_basic"],
            num_layers_r=CFG["num_layers_r"], num_r=NUM_R)
        loss, grads = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), dp_specs),
            out_specs=(P(), P()),
        )(params, constants, x[0], shard_sequence(labels, mesh), dp)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_hist = []
    for i in range(6):
        params, opt_state, loss = step(
            params, opt_state, jax.random.key(50 + i),
            shard_sequence(x[0], mesh), shard_sequence(labels, mesh))
        losses_hist.append(float(loss))
    assert np.all(np.isfinite(losses_hist)), losses_hist
    assert losses_hist[-1] < losses_hist[0], losses_hist
