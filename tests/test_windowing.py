"""Golden tests for the sliding-window scan and fold windowing.

Oracle = literal transcription of the reference's while-loop semantics
(dataset_utils.py:161-258) and prediction rollup (modeling_utils.py:2695-2777).
Both the C++ (native) and NumPy implementations must match it.
"""

import numpy as np
import pytest

import med_tpu.data.windowing as W
from med_tpu.data.windowing import (
    compute_window_size_stride,
    subject_runs,
    window_data,
    window_predictions,
    window_scan,
)


def oracle_scan(g, window, stride):
    g = np.asarray(g).reshape(-1)
    n = len(g)
    nz = np.flatnonzero(g)
    if nz.size == 0:
        return []
    start = int(nz[0])
    starts = []
    while start < n - window:
        end = start + window
        if g[start] != g[end - 1]:
            start += 1
            continue
        starts.append(start)
        start += stride
    return starts


def random_gestures(rng, n):
    """Gesture stream made of variable-length runs, with leading zeros."""
    g = []
    g.extend([0] * int(rng.integers(0, 5)))
    while len(g) < n:
        g.extend([int(rng.integers(1, 16))] * int(rng.integers(1, 25)))
    return np.array(g[:n], dtype=np.int32)


def test_window_size_stride():
    assert compute_window_size_stride(5) == (10, 6)
    assert compute_window_size_stride(15) == (30, 20)
    assert compute_window_size_stride(30) == (60, 40)


@pytest.mark.parametrize("native", [False, True])
def test_window_scan_matches_oracle(rng, native, monkeypatch):
    if not native:
        monkeypatch.setattr(W, "get_native_lib", lambda: None)
    for _ in range(50):
        n = int(rng.integers(5, 400))
        g = random_gestures(rng, n)
        window, stride = (10, 6) if rng.integers(0, 2) else (30, 20)
        got = window_scan(g, window, stride).tolist()
        assert got == oracle_scan(g, window, stride)


def test_window_scan_edge_cases():
    assert window_scan(np.zeros(50, np.int32), 10, 6).size == 0  # all zero
    assert window_scan(np.array([1] * 10, np.int32), 10, 6).size == 0  # n == w
    assert window_scan(np.array([], np.int32), 10, 6).size == 0


def test_subject_runs_order():
    subj = ["b", "b", "a", "a", "a", "c"]
    runs = subject_runs(subj)
    assert [s for s, _ in runs] == ["b", "a", "c"]
    np.testing.assert_array_equal(runs[1][1], [2, 3, 4])


def test_window_data_shapes_and_labels(rng):
    n_a, n_b = 100, 80
    g = np.concatenate([random_gestures(rng, n_a), random_gestures(rng, n_b)])
    subj = np.array(["A"] * n_a + ["B"] * n_b, dtype=object)
    img = rng.normal(size=(n_a + n_b, 16)).astype(np.float32)
    kin = rng.normal(size=(n_a + n_b, 4)).astype(np.float32)
    e = rng.integers(0, 2, size=(n_a + n_b, 5))

    iw, kw, gw, ew, sw = window_data(img, kin, g, e, subj, 10, 6)
    n_windows = len(iw)
    assert kw.shape == (n_windows, 10, 4)
    assert gw.shape == (n_windows, 1)
    assert ew.shape == (n_windows, 5)
    assert sw.shape == (n_windows,)

    # labels come from the window's first frame; windows never cross subjects
    # and never mix first/last gesture
    starts_a = oracle_scan(g[:n_a], 10, 6)
    starts_b = oracle_scan(g[n_a:], 10, 6)
    assert n_windows == len(starts_a) + len(starts_b)
    for w_idx, s in enumerate(starts_a):
        np.testing.assert_array_equal(iw[w_idx], img[s : s + 10])
        assert gw[w_idx, 0] == g[s]
        np.testing.assert_array_equal(ew[w_idx], e[s])
        assert sw[w_idx] == "A"
    for w_idx, s in enumerate(starts_b):
        np.testing.assert_array_equal(kw[len(starts_a) + w_idx], kin[n_a + s : n_a + s + 10])
        assert sw[len(starts_a) + w_idx] == "B"


def test_window_data_empty():
    iw, kw, gw, ew, sw = window_data(
        np.zeros((5, 8), np.float32),
        np.zeros((5, 2), np.float32),
        np.zeros(5),
        np.zeros((5, 5)),
        ["A"] * 5,
        10,
        6,
    )
    assert len(iw) == 0 and len(sw) == 0


def test_window_predictions_binary_and_multiclass(rng):
    n = 200
    g = random_gestures(rng, n)
    subj = np.array(["X"] * n, dtype=object)
    preds = rng.random(n)
    labels = rng.integers(0, 2, n)

    pw, lw, gw, sw = window_predictions(preds, labels, g, subj, 10, 6, binary=True)
    starts = oracle_scan(g, 10, 6)
    assert len(pw) == len(starts)
    for k, s in enumerate(starts):
        want = 1.0 if preds[s : s + 10].mean() >= 0.5 else 0.0
        assert pw[k, 0] == want
        assert lw[k, 0] == labels[s]
        assert gw[k, 0] == g[s]

    mc_preds = rng.integers(0, 6, n).astype(float)
    pw, _, _, _ = window_predictions(mc_preds, labels, g, subj, 10, 6, binary=False)
    for k, s in enumerate(starts):
        assert pw[k, 0] == np.round(mc_preds[s : s + 10].mean())
