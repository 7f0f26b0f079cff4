"""Golden tests for the error-label powerset transformation.

The oracle below is a literal frame-by-frame transcription of the behavioral
spec (the asymmetric elif ladder, reference dataset_utils.py:760-845); the
framework's vectorized implementation must match it on every input in
{0,1}^5, plus random streams.
"""

import itertools

import numpy as np
import pytest

from med_tpu.data.labels import (
    class_distributions,
    powerset_error_labels,
    select_error_labels,
    skill_one_hot,
)


def oracle_powerset(e, delete_nd):
    """Frame-loop oracle with the reference's exact branch ordering."""
    n = e.shape[0]
    out = np.zeros((n, 7), dtype=np.int32)
    mask = np.zeros(n, dtype=bool)
    for i in range(n):
        if e[i, 4] == 1:
            out[i, 6] = 1
            s = e[i, :4].sum()
            if (e[i, 0] == 1 and s == 1) or (e[i, 0] == 1 and e[i, 1] == 1):
                out[i, 1] = 1
            elif (e[i, 2] == 1 and s == 1) or (e[i, 2] == 1 and e[i, 1] == 1):
                out[i, 2] = 1
            elif (e[i, 3] == 1 and s == 1) or (e[i, 3] == 1 and e[i, 0] == 1):
                out[i, 3] = 1
            elif e[i, 0] == 1 and e[i, 2] == 1:
                out[i, 4] = 1
            elif e[i, 2] == 1 and e[i, 3] == 1:
                out[i, 5] = 1
            elif e[i, 1] == 1:
                if delete_nd:
                    out[i, 6] = 0
                    mask[i] = True
        else:
            out[i, 0] = 1
    return out, mask


@pytest.mark.parametrize("delete_nd", [False, True])
def test_powerset_exhaustive(delete_nd):
    rows = np.array(list(itertools.product([0, 1], repeat=5)))
    got, got_mask = powerset_error_labels(rows, delete_ND=delete_nd)
    want, want_mask = oracle_powerset(rows, delete_nd)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_mask, want_mask)


@pytest.mark.parametrize("delete_nd", [False, True])
def test_powerset_random(rng, delete_nd):
    e = rng.integers(0, 2, size=(5000, 5))
    # make the global flag consistent with typical data (any error -> flag),
    # but also keep some inconsistent rows to exercise the fallback branches
    e[:4000, 4] = (e[:4000, :4].sum(axis=1) > 0).astype(int)
    got, got_mask = powerset_error_labels(e, delete_ND=delete_nd)
    want, want_mask = oracle_powerset(e, delete_nd)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_mask, want_mask)


def test_powerset_classes_mutually_exclusive(rng):
    e = rng.integers(0, 2, size=(1000, 5))
    got, _ = powerset_error_labels(e, delete_ND=True)
    # exactly one of columns 0..5 set, except dropped-ND rows (all zero)
    assert ((got[:, :6].sum(axis=1) <= 1)).all()


def test_select_error_labels_window_and_frame():
    p = np.arange(42).reshape(6, 7)
    np.testing.assert_array_equal(select_error_labels(p, "global"), p[:, -1])
    np.testing.assert_array_equal(
        select_error_labels(p, "all_errors"), p[:, :6]
    )
    np.testing.assert_array_equal(
        select_error_labels(p, "Multiple_Attempts"), p[:, 2]
    )
    f = np.arange(84).reshape(2, 6, 7)
    np.testing.assert_array_equal(
        select_error_labels(f, "global", "frame"), f[:, :, -1]
    )
    with pytest.raises(ValueError):
        select_error_labels(p, "bogus")


def test_class_distributions():
    p = np.zeros((10, 7))
    p[:3, 6] = 1
    binary, specific = class_distributions(p)
    assert binary == pytest.approx((0.7, 0.3))
    assert len(specific) == 6


def test_skill_one_hot():
    out = skill_one_hot("Needle_Passing_B001", 4)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[:, 0], 1)  # B -> Novice
    out = skill_one_hot("Suturing_E003", 2)
    np.testing.assert_array_equal(out[:, 2], 1)  # E -> Expert
