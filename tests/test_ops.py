"""Ops-layer tests: interpolation vs torch, sliding attention XLA vs Pallas
(interpret mode) vs a literal window-materialization oracle, metrics vs
sklearn."""

import numpy as np
import jax.numpy as jnp
import pytest

from med_tpu.ops.interpolate import interp1d_linear, interp1d_nearest
from med_tpu.ops.attention import (
    attend,
    layer_norm,
    sliding_window_attention_pallas,
    sliding_window_attention_xla,
    sliding_windows,
)
from med_tpu.ops.metrics import confusion_matrix, metrics_from_cm


# ---------------------------------------------------------------- interpolate
@pytest.mark.parametrize("in_size,out_size", [(100, 100), (100, 6), (6, 100), (7, 3), (3, 7)])
def test_interp_nearest_matches_torch(rng, in_size, out_size):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 4, in_size)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.tensor(x), size=out_size, mode="nearest"
    ).numpy()
    got = np.asarray(interp1d_nearest(jnp.asarray(x), out_size, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("in_size,out_size", [(100, 100), (100, 6), (6, 100), (7, 3), (3, 7)])
def test_interp_linear_matches_torch(rng, in_size, out_size):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 4, in_size)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.tensor(x), size=out_size, mode="linear"
    ).numpy()
    got = np.asarray(interp1d_linear(jnp.asarray(x), out_size, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ attention
def oracle_swa(q, k, v, window):
    """Literal per-frame zero-padded window attention (reference
    models_COG.py:147-176 semantics)."""
    T, H, M, dk = q.shape
    dv = v.shape[-1]
    out = np.zeros((T, H, M, dv), np.float64)
    kp = np.concatenate([np.zeros((window - 1,) + k.shape[1:]), k], 0)
    vp = np.concatenate([np.zeros((window - 1,) + v.shape[1:]), v], 0)
    for t in range(T):
        kw = kp[t : t + window]  # (W, H, dk)
        vw = vp[t : t + window]
        for h in range(H):
            s = q[t, h] @ kw[:, h].T / np.sqrt(dk)  # (M, W)
            e = np.exp(s - s.max(-1, keepdims=True))
            a = e / e.sum(-1, keepdims=True)
            out[t, h] = a @ vw[:, h]
    return out


def test_sliding_windows_zero_pad(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    w = np.asarray(sliding_windows(jnp.asarray(x), 4))
    assert w.shape == (5, 4, 3)
    np.testing.assert_array_equal(w[0, :3], 0)
    np.testing.assert_array_equal(w[0, 3], x[0])
    np.testing.assert_array_equal(w[4], x[1:5])


def test_swa_xla_matches_oracle(rng):
    # the public API is head-major (H, T, ...); the oracle stays T-major
    T, H, M, dk, dv, W = 37, 2, 5, 8, 8, 7
    q = rng.normal(size=(T, H, M, dk)).astype(np.float32)
    k = rng.normal(size=(T, H, dk)).astype(np.float32)
    v = rng.normal(size=(T, H, dv)).astype(np.float32)
    got = np.asarray(sliding_window_attention_xla(
        q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2), v.transpose(1, 0, 2), W
    )).transpose(1, 0, 2, 3)
    want = oracle_swa(q, k, v, W)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_swa_pallas_matches_xla(rng):
    T, H, M, dk, dv, W = 100, 2, 5, 8, 8, 30
    q = rng.normal(size=(H, T, M, dk)).astype(np.float32)
    k = rng.normal(size=(H, T, dk)).astype(np.float32)
    v = rng.normal(size=(H, T, dv)).astype(np.float32)
    want = np.asarray(sliding_window_attention_xla(q, k, v, W))
    got = np.asarray(
        sliding_window_attention_pallas(q, k, v, W, tile=32, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attend_matches_torch_softmax_matmul(rng):
    torch = pytest.importorskip("torch")
    q = rng.normal(size=(3, 4, 6, 8)).astype(np.float32)
    k = rng.normal(size=(3, 4, 10, 8)).astype(np.float32)
    v = rng.normal(size=(3, 4, 10, 8)).astype(np.float32)
    tq, tk, tv = map(torch.tensor, (q, k, v))
    scores = tq @ tk.transpose(-1, -2) / np.sqrt(8)
    want = (torch.softmax(scores, -1) @ tv).numpy()
    got = np.asarray(attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(4, 7, 16)).astype(np.float32)
    want = torch.nn.functional.layer_norm(torch.tensor(x), (16,)).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- metrics
def test_confusion_matrix_and_metrics_match_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    for n_classes, avg in [(2, "binary"), (6, "macro"), (6, "weighted")]:
        y = rng.integers(0, n_classes, 500)
        p = rng.integers(0, n_classes, 500)
        cm = np.asarray(confusion_matrix(jnp.asarray(y), jnp.asarray(p), n_classes))
        np.testing.assert_array_equal(cm, sk.confusion_matrix(y, p, labels=range(n_classes)))
        m = metrics_from_cm(cm, average=avg)
        assert m["f1"] == pytest.approx(sk.f1_score(y, p, average=avg), abs=1e-12)
        assert m["accuracy"] == pytest.approx(sk.accuracy_score(y, p), abs=1e-12)
        assert m["jaccard"] == pytest.approx(sk.jaccard_score(y, p, average=avg), abs=1e-12)


def test_confusion_matrix_mask(rng):
    y = jnp.asarray([0, 1, 1, 0])
    p = jnp.asarray([0, 1, 0, 0])
    mask = jnp.asarray([1, 1, 0, 0])
    cm = np.asarray(confusion_matrix(y, p, 2, mask))
    np.testing.assert_array_equal(cm, [[1, 0], [0, 1]])


def test_metrics_absent_class():
    sk = pytest.importorskip("sklearn.metrics")
    # class 2 absent from both y and p -> sklearn macro averages over present
    y = np.array([0, 0, 1, 1])
    p = np.array([0, 1, 1, 1])
    cm = np.asarray(confusion_matrix(jnp.asarray(y), jnp.asarray(p), 3))
    m = metrics_from_cm(cm, "macro")
    assert m["f1"] == pytest.approx(sk.f1_score(y, p, average="macro"))


def test_swa_pallas_grad_matches_xla(rng):
    """The custom-VJP Pallas path differentiates and matches the XLA
    gradient (interpret mode on CPU)."""
    import jax
    from med_tpu.ops.attention import _swa_pallas_ad

    T, H, M, dk, dv, W = 40, 2, 3, 4, 4, 5
    q = jnp.asarray(rng.normal(size=(H, T, M, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(H, T, dv)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(_swa_pallas_ad(q, k, v, W, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sliding_window_attention_xla(q, k, v, W) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_f1_from_cm_device_matches_host(rng):
    """On-device selection metric == the host sklearn-semantics metric."""
    from med_tpu.ops.metrics import f1_from_cm_device, metrics_from_cm

    for trial in range(20):
        C = int(rng.integers(2, 7))
        cm = rng.integers(0, 50, size=(C, C))
        # exercise absent classes (zero rows+cols) too
        if trial % 3 == 0:
            k = int(rng.integers(0, C))
            cm[k, :] = 0
            cm[:, k] = 0
        for avg in ("binary", "macro", "weighted"):
            got = float(f1_from_cm_device(jnp.asarray(cm), avg))
            want = metrics_from_cm(cm, avg)["f1"]
            assert got == pytest.approx(want, abs=1e-6), (avg, cm)


def test_swa_packed_matches_xla_and_grads(rng):
    """The packed-layout (lane-major) kernels match the XLA oracle in
    forward and gradients (interpret mode on CPU)."""
    import jax
    from med_tpu.ops.attention import (
        _swa_packed_ad,
        sliding_window_attention_packed_bwd,
        sliding_window_attention_packed_fwd,
        sliding_window_attention_xla,
    )

    T, H, M, dk, dv, W = 40, 2, 3, 4, 4, 5
    q4 = jnp.asarray(rng.normal(size=(H, T, M, dk)), jnp.float32)
    k4 = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    v4 = jnp.asarray(rng.normal(size=(H, T, dv)), jnp.float32)
    qT = q4.reshape(H, T * M, dk).transpose(0, 2, 1)
    kT = k4.transpose(0, 2, 1)
    vT = v4.transpose(0, 2, 1)

    want = np.asarray(sliding_window_attention_xla(q4, k4, v4, W))
    got = sliding_window_attention_packed_fwd(qT, kT, vT, W, M, tile=16,
                                              interpret=True)
    got4 = np.asarray(got).transpose(0, 2, 1).reshape(H, T, M, dv)
    np.testing.assert_allclose(got4, want, rtol=1e-4, atol=1e-5)

    def loss_packed(q, k, v):
        return jnp.sum(_swa_packed_ad(q, k, v, W, M, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sliding_window_attention_xla(q, k, v, W) ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qT, kT, vT)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q4, k4, v4)
    np.testing.assert_allclose(
        np.asarray(gp[0]).transpose(0, 2, 1).reshape(H, T, M, dk),
        np.asarray(gx[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]).transpose(0, 2, 1),
                               np.asarray(gx[1]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[2]).transpose(0, 2, 1),
                               np.asarray(gx[2]), rtol=1e-4, atol=1e-5)


def test_swa_packed_wide_window_grads(rng):
    """Window wider than the old fixed 256-lane key halo allowed at
    tile=128 (needs tile + 2*(window-1) halo keys in the merged backward):
    the halo is now derived per-call, so wide windows stay exact instead of
    silently dropping in-band keys."""
    import jax
    from med_tpu.ops.attention import (
        _key_halo,
        _swa_packed_ad,
        sliding_window_attention_xla,
    )

    T, H, M, dk, W = 200, 1, 2, 4, 80
    assert 128 + 2 * (W - 1) > 256  # the regime the fixed halo got wrong
    assert _key_halo(128, W) == 384
    q4 = jnp.asarray(rng.normal(size=(H, T, M, dk)), jnp.float32)
    k4 = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    v4 = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    qT = q4.reshape(H, T * M, dk).transpose(0, 2, 1)
    kT = k4.transpose(0, 2, 1)
    vT = v4.transpose(0, 2, 1)

    def loss_packed(q, k, v):
        return jnp.sum(_swa_packed_ad(q, k, v, W, M, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sliding_window_attention_xla(q, k, v, W) ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qT, kT, vT)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q4, k4, v4)
    np.testing.assert_allclose(
        np.asarray(gp[0]).transpose(0, 2, 1).reshape(H, T, M, dk),
        np.asarray(gx[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]).transpose(0, 2, 1),
                               np.asarray(gx[1]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[2]).transpose(0, 2, 1),
                               np.asarray(gx[2]), rtol=1e-4, atol=1e-5)


def test_swa_packed_kh_chunked_bwd_grads(rng):
    """Large-m regime (TSVN: m = window = 30): the merged backward's banded
    buffers exceed the scoped-VMEM stack unchunked, so the kernel splits the
    key halo into 128-row chunks (dq accumulated, dk/dv rows assembled from
    per-chunk slices). Grads must match the XLA path exactly."""
    import jax
    from med_tpu.ops.attention import (
        _swa_packed_ad,
        sliding_window_attention_xla,
    )

    T, H, M, dk, W = 140, 2, 30, 4, 30
    # the chunk trigger: 4 banded f32 buffers at qn=(128+W-1)*M > 11 MB
    assert 4 * 256 * (128 + W - 1) * M * 4 > 11e6
    q4 = jnp.asarray(rng.normal(size=(H, T, M, dk)), jnp.float32)
    k4 = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    v4 = jnp.asarray(rng.normal(size=(H, T, dk)), jnp.float32)
    qT = q4.reshape(H, T * M, dk).transpose(0, 2, 1)
    kT = k4.transpose(0, 2, 1)
    vT = v4.transpose(0, 2, 1)

    def loss_packed(q, k, v):
        return jnp.sum(_swa_packed_ad(q, k, v, W, M, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sliding_window_attention_xla(q, k, v, W) ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qT, kT, vT)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q4, k4, v4)
    np.testing.assert_allclose(
        np.asarray(gp[0]).transpose(0, 2, 1).reshape(H, T, M, dk),
        np.asarray(gx[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]).transpose(0, 2, 1),
                               np.asarray(gx[1]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[2]).transpose(0, 2, 1),
                               np.asarray(gx[2]), rtol=1e-4, atol=1e-5)


def test_swa_packed_vmap_grads_match_xla(rng):
    """vmap over the packed custom-VJP path (the trial-parallel /
    fold-parallel regime): jax's generic pallas batching inserts a squeezed
    interior block dim that the TPU lowering rejects, so the op carries a
    custom_vmap rule folding the batch axis into the head grid axis."""
    import jax
    from med_tpu.ops.attention import _swa_packed_ad, sliding_window_attention_xla

    T, H, M, dk, W, B = 40, 2, 3, 4, 5, 3
    q4 = jnp.asarray(rng.normal(size=(B, H, T, M, dk)), jnp.float32)
    k4 = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    v4 = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    qT = q4.reshape(B, H, T * M, dk).transpose(0, 1, 3, 2)
    kT = k4.transpose(0, 1, 3, 2)
    vT = v4.transpose(0, 1, 3, 2)

    def loss_packed(q, k, v):
        return jnp.sum(_swa_packed_ad(q, k, v, W, M, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sliding_window_attention_xla(q, k, v, W) ** 2)

    gp = jax.vmap(jax.grad(loss_packed, argnums=(0, 1, 2)))(qT, kT, vT)
    gx = jax.vmap(jax.grad(loss_xla, argnums=(0, 1, 2)))(q4, k4, v4)
    np.testing.assert_allclose(
        np.asarray(gp[0]).transpose(0, 1, 3, 2).reshape(B, H, T, M, dk),
        np.asarray(gx[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]).transpose(0, 1, 3, 2),
                               np.asarray(gx[1]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[2]).transpose(0, 1, 3, 2),
                               np.asarray(gx[2]), rtol=1e-4, atol=1e-5)
