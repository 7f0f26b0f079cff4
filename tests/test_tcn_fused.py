"""Fused dilated-residual TCN stack (ops/tcn_fused.py) vs the per-layer
module path: op-level forward/gradient parity against the lax oracle, and
module-level parity (COGStage / TeCNo) between fused=True (interpret mode on
CPU) and fused=False, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from med_tpu.models.cog import COGStage
from med_tpu.models.tcn import TeCNo
from med_tpu.ops.tcn_fused import dilated_residual_stack, dilated_stack_xla


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _op_inputs(rng, L=5, T=96, C=16):
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(L, 3, C, C)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(L, C)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(L, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(L, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(L, T, C)), jnp.uint8)
    return x, w3, b3, w1, b1, mask


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_forward_matches_oracle(rng, causal, use_mask):
    x, w3, b3, w1, b1, mask = _op_inputs(rng)
    m = mask if use_mask else None
    got = dilated_residual_stack(x, w3, b3, w1, b1, causal=causal, mask=m)
    want = dilated_stack_xla(x, w3, b3, w1, b1, causal=causal, mask=m)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_grad_matches_oracle(rng, use_mask):
    x, w3, b3, w1, b1, mask = _op_inputs(rng)
    m = mask if use_mask else None
    probe = jnp.cos(jnp.arange(x.size).reshape(x.shape) * 0.01)

    def loss(fn):
        def f(x, w3, b3, w1, b1):
            return jnp.sum(fn(x, w3, b3, w1, b1, causal=True, mask=m) * probe)
        return f

    got = jax.grad(loss(dilated_residual_stack), argnums=(0, 1, 2, 3, 4))(
        x, w3, b3, w1, b1)
    want = jax.grad(loss(dilated_stack_xla), argnums=(0, 1, 2, 3, 4))(
        x, w3, b3, w1, b1)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("use_mask", [False, True])
def test_multistack_matches_stagewise_oracle(rng, causal, use_mask):
    """The merged multi-stage kernel == running the stages back-to-back
    through the lax oracle: stage outputs and all gradients (incl. the
    per-stage-output cotangents joining dh at the right boundary)."""
    from med_tpu.ops.tcn_fused import dilated_residual_multistack

    L0, Lr, S, T, C = 4, 3, 3, 64, 16
    Lt = L0 + (S - 1) * Lr
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(Lt, 3, C, C)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(Lt, C)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(Lt, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(Lt, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(Lt, T, C)), jnp.uint8)
    m = mask if use_mask else None

    bounds = [0, L0, L0 + Lr, L0 + 2 * Lr, Lt]

    def oracle(x, w3, b3, w1, b1):
        outs = []
        h = x
        for s in range(S):
            a, b = bounds[s], bounds[s + 1]
            h = dilated_stack_xla(
                h, w3[a:b], b3[a:b], w1[a:b], b1[a:b], causal=causal,
                mask=None if m is None else m[a:b])
            outs.append(h)
        return jnp.stack(outs)

    got = dilated_residual_multistack(x, w3, b3, w1, b1, L0, Lr,
                                      causal=causal, mask=m)
    want = oracle(x, w3, b3, w1, b1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradients: probe every stage output so each cotangent is exercised
    probe = jnp.cos(jnp.arange(want.size).reshape(want.shape) * 0.01)

    def loss(fn):
        def f(x, w3, b3, w1, b1):
            return jnp.sum(fn(x, w3, b3, w1, b1) * probe)
        return f

    def multi(x, w3, b3, w1, b1):
        return dilated_residual_multistack(x, w3, b3, w1, b1, L0, Lr,
                                           causal=causal, mask=m)

    got_g = jax.grad(loss(multi), argnums=(0, 1, 2, 3, 4))(x, w3, b3, w1, b1)
    want_g = jax.grad(loss(oracle), argnums=(0, 1, 2, 3, 4))(x, w3, b3, w1, b1)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("use_mask", [False, True])
def test_multistack_stages_matches_concat(rng, causal, use_mask):
    """The per-stage-operand multistack == the concatenated-operand one:
    stage outputs, dx, and every per-stage weight gradient (the guarded
    clamped-block writes must not clobber owner blocks)."""
    from med_tpu.ops.tcn_fused import (
        dilated_residual_multistack,
        dilated_residual_multistack_stages,
    )

    L0, Lr, S, T, C = 4, 3, 3, 64, 16
    Lt = L0 + (S - 1) * Lr
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(Lt, 3, C, C)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(Lt, C)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(Lt, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(Lt, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(Lt, T, C)), jnp.uint8)

    bounds = [0] + [L0 + s * Lr for s in range(S)]
    pairs = list(zip(bounds[:-1], bounds[1:]))
    ws = [(w3[a:b], b3[a:b], w1[a:b], b1[a:b]) for a, b in pairs]
    masks = [mask[a:b] for a, b in pairs] if use_mask else None
    m = mask if use_mask else None

    got = dilated_residual_multistack_stages(x, ws, L0, Lr, causal=causal,
                                             masks=masks)
    want = dilated_residual_multistack(x, w3, b3, w1, b1, L0, Lr,
                                       causal=causal, mask=m)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    probe = jnp.cos(jnp.arange(want.size).reshape(want.shape) * 0.01)

    def loss_stages(x, ws):
        out = dilated_residual_multistack_stages(x, ws, L0, Lr,
                                                 causal=causal, masks=masks)
        return jnp.sum(out * probe)

    def loss_cat(x, w3, b3, w1, b1):
        out = dilated_residual_multistack(x, w3, b3, w1, b1, L0, Lr,
                                          causal=causal, mask=m)
        return jnp.sum(out * probe)

    gx_s, gws = jax.grad(loss_stages, argnums=(0, 1))(x, tuple(ws))
    gx_c, gw3, gb3, gw1, gb1 = jax.grad(
        loss_cat, argnums=(0, 1, 2, 3, 4))(x, w3, b3, w1, b1)
    np.testing.assert_allclose(gx_s, gx_c, rtol=1e-5, atol=1e-6)
    for s, (a, b) in enumerate(pairs):
        for got_g, want_g in zip(gws[s], (gw3[a:b], gb3[a:b],
                                          gw1[a:b], gb1[a:b])):
            np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("channel_dropout", [False, True])
def test_cogstage_fused_matches_module_path(rng, channel_dropout):
    """COGStage(fused=True) == COGStage(fused=False): same params (the fused
    path reads the per-layer param tree), same eval logits, same grads."""
    x = jnp.asarray(rng.normal(size=(1, 64, 24)), jnp.float32)
    kw = dict(num_layers=4, f_maps=16, out_classes=3, causal=True,
              channel_dropout=channel_dropout)
    fused = COGStage(**kw, fused=True)
    plain = COGStage(**kw, fused=False)

    v1 = fused.init(jax.random.PRNGKey(0), x, False)
    v2 = plain.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(a, b)

    f1, l1 = fused.apply(v1, x, False)
    f2, l2 = plain.apply(v1, x, False)
    np.testing.assert_allclose(f1, f2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-6)

    def loss(mod):
        def f(params):
            _, logits = mod.apply(params, x, False)
            return jnp.sum(logits ** 2)
        return f

    g1 = jax.grad(loss(fused))(v1)
    g2 = jax.grad(loss(plain))(v1)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_cogstage_fused_train_dropout_runs(rng):
    """The fused train path (uint8 mask input) runs and actually drops."""
    x = jnp.asarray(rng.normal(size=(1, 64, 24)), jnp.float32)
    mod = COGStage(num_layers=3, f_maps=16, out_classes=2, fused=True)
    v = mod.init(jax.random.PRNGKey(0), x, False)
    f_eval, _ = mod.apply(v, x, False)
    f_tr, _ = mod.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert f_tr.shape == f_eval.shape
    assert not np.allclose(f_tr, f_eval)
    # two different rng keys -> different masks
    f_tr2, _ = mod.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(f_tr, f_tr2)


def test_cog_merged_slow_path_matches_per_stage(rng):
    """COG(fused=True) routes the slow path through the merged multi-stage
    kernel; COG(fused=False) runs the per-stage loop. Same param tree, same
    eval logits, same grads (eval mode: no dropout, so exact up to kernel
    fp32 noise)."""
    from med_tpu.models.cog import COG

    kw = dict(num_layers_basic=3, num_layers_r=2, num_r=2, f_maps=16,
              f_dim=24, out_classes=2, d_model=16, d_q=2, len_q=6,
              use_pallas=False)
    merged = COG(**kw, fused=True)
    plain = COG(**kw, fused=False)
    x = jnp.asarray(rng.normal(size=(1, 60, 24)), jnp.float32)

    v1 = merged.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, x, False)
    v2 = plain.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, False)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(a, b)

    o1, _ = merged.apply(v1, x, False)
    o2, _ = plain.apply(v1, x, False)
    assert len(o1) == len(o2)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def loss(mod):
        def f(params):
            outs, _ = mod.apply({**v1, "params": params}, x, False)
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g1 = jax.grad(loss(merged))(v1["params"])
    g2 = jax.grad(loss(plain))(v1["params"])
    # both paths are exact vs the oracle; their mutual diff is reassociation
    # noise amplified through the fast path's softmax chains (worst leaves
    # ~3e-4 rel on a handful of elements)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    # train mode runs through the merged kernel's mask path
    o_tr, _ = merged.apply(v1, x, True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert all(np.isfinite(np.asarray(o)).all() for o in o_tr)


def test_tecno_fused_matches_module_path(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 32)), jnp.float32)
    kw = dict(num_stages=2, num_layers=4, f_maps=16, in_dim=32, out_classes=3)
    fused = TeCNo(**kw, fused=True)
    plain = TeCNo(**kw, fused=False)
    v = fused.init(jax.random.PRNGKey(0), x, False)
    np.testing.assert_allclose(
        fused.apply(v, x, False), plain.apply(v, x, False),
        rtol=1e-6, atol=1e-6)


def test_fused_gate_pins_measured_vmem_boundaries():
    """fused_stack_fits reproduces the scoped-VMEM compile boundaries
    measured on v5e (each False point was an actual Mosaic allocator OOM,
    each True point a successful compile — see the function docstring).
    Beyond the boundary the models fall back to the exact XLA layer loop
    instead of failing to compile."""
    from med_tpu.ops.tcn_fused import fused_stack_fits

    # COG multistack (pad = 2**11): the T=1024 bench regime stays fused
    assert fused_stack_fits(1024, 2 ** 11, train=True)
    assert fused_stack_fits(1536, 2 ** 11, train=True)   # measured OK
    assert not fused_stack_fits(2048, 2 ** 11, train=True)  # measured OOM
    # TeCNo single stack (L=8)
    assert fused_stack_fits(2048, 2 ** 8, train=True)    # measured OK
    assert not fused_stack_fits(4096, 2 ** 8, train=True)  # measured OOM
    # frozen/eval path (save-free primal)
    assert fused_stack_fits(4096, 2 ** 8, train=False)   # measured OK
    assert not fused_stack_fits(6144, 2 ** 8, train=False)  # measured OOM


def test_bitpacked_dropout_mask_statistics(rng):
    """The rate-0.5 dropout mask is unpacked from threefry BITS (one per
    element, 32x fewer words than per-element bernoulli — see
    layers.ResidualStack.dropout_mask): values are {0,1}, the keep rate is
    0.5 within binomial noise, different rng keys give different masks, and
    odd T (non-multiple of the 32-bit word width) keeps exact shape."""
    import flax.linen as nn

    from med_tpu.models.layers import ResidualStack

    class Draw(nn.Module):
        T: int

        @nn.compact
        def __call__(self):
            stack = ResidualStack(num_layers=8, channels=64, fused=False)
            return stack.dropout_mask(1, self.T)

    def draw(T, key):
        out, _ = Draw(T).init_with_output(
            {"params": jax.random.PRNGKey(9),
             "dropout": jax.random.PRNGKey(key)})
        return np.asarray(out)

    for T, key in ((1024, 0), (1024, 1), (333, 2)):
        m = draw(T, key)
        assert m.shape == (8, 1, T, 64) and m.dtype == np.uint8
        assert set(np.unique(m)) <= {0, 1}
        n = m.size
        # binomial(n, .5): mean within 6 sigma
        assert abs(m.mean() - 0.5) < 6 * 0.5 / np.sqrt(n)
        # per-layer independence sanity: layers differ
        assert not np.array_equal(m[0], m[1])

    assert not np.array_equal(draw(256, 3), draw(256, 4))
