"""Golden tests for siamese pair construction: C++ and NumPy paths vs a
literal transcription of the reference's double loop
(dataset_utils.py:588-672)."""

import numpy as np
import pytest

import med_tpu.data.siamese as S
from med_tpu.data.siamese import (
    create_test_pairs,
    create_train_pairs,
    materialize_pairs,
    sample_balanced_pairs,
)


def oracle_train_pairs(gest, err, subj):
    n = len(gest)
    rows = []
    instance_count_1 = 0
    for i in range(n):
        if i != 0:
            if subj[i] != subj[i - 1]:
                instance_count_1 = 0
            elif gest[i] != gest[i - 1]:
                instance_count_1 += 1
        instance_count_2 = 1
        for j in range(i + 2, n):
            if j != i + 2:
                if subj[j] != subj[j - 1]:
                    instance_count_2 = 0
                elif gest[j] != gest[j - 1]:
                    instance_count_2 += 1
            create = False
            if subj[i] != subj[j]:
                create = True
            elif gest[i] != gest[j]:
                create = True
            else:
                for k in range(i + 1, j):
                    if gest[k] != gest[i]:
                        create = True
                        break
            if not create:
                continue
            if err[i] == 0 and err[j] == 0:
                label = 0
            elif (err[i] == 1 and err[j] == 0) or (err[i] == 0 and err[j] == 1):
                label = 1
            else:
                continue
            rows.append((i, j, instance_count_1, instance_count_2, label))
    return rows


def random_windows(rng, n):
    subj, gest = [], []
    s = 0
    while len(gest) < n:
        n_runs = int(rng.integers(2, 6))
        for _ in range(n_runs):
            g = int(rng.integers(1, 5))
            gest.extend([g] * int(rng.integers(1, 5)))
            subj.extend([f"S{s}"] * (len(gest) - len(subj)))
        s += 1
    gest = np.array(gest[:n])
    subj = np.array(subj[:n], dtype=object)
    err = rng.integers(0, 2, n)
    return gest, err, subj


@pytest.mark.parametrize("native", [True, False])
def test_train_pairs_match_oracle(rng, native, monkeypatch):
    if not native:
        monkeypatch.setattr(S, "get_native_lib", lambda: None)
    for _ in range(8):
        n = int(rng.integers(10, 60))
        gest, err, subj = random_windows(rng, n)
        got = create_train_pairs(gest, err, subj)
        want = oracle_train_pairs(gest, err, subj)
        assert len(got["position_1"]) == len(want)
        for k, row in enumerate(want):
            assert (
                got["position_1"][k], got["position_2"][k],
                got["instance_1"][k], got["instance_2"][k], got["label"][k],
            ) == row


def test_native_and_numpy_agree(rng, monkeypatch):
    gest, err, subj = random_windows(rng, 120)
    native = create_train_pairs(gest, err, subj)
    monkeypatch.setattr(S, "get_native_lib", lambda: None)
    fallback = create_train_pairs(gest, err, subj)
    for k in native:
        np.testing.assert_array_equal(native[k], fallback[k])


def test_test_pairs(rng):
    gest, err, subj = random_windows(rng, 40)
    err_train = rng.integers(0, 2, 100)
    pairs = create_test_pairs(gest, err, subj, err_train, n_comparisons=5)
    assert len(pairs["position_1"]) == 40 * 5
    # every train side is clean
    assert (err_train[pairs["position_1"]] == 0).all()
    # label equals the test window's error state
    np.testing.assert_array_equal(
        pairs["label"].reshape(40, 5)[:, 0], (err[:40] == 1).astype(int)
    )


def test_balanced_sampling_and_materialize(rng):
    gest, err, subj = random_windows(rng, 50)
    pairs = create_train_pairs(gest, err, subj)
    bal = sample_balanced_pairs(pairs, n_pairs=64)
    assert len(bal["label"]) == 64
    assert bal["label"].sum() == 32
    img = rng.normal(size=(50, 10, 8)).astype(np.float32)
    kin = rng.normal(size=(50, 10, 4)).astype(np.float32)
    pi, pk, lab = materialize_pairs(bal, img, kin)
    assert pi.shape == (64, 2, 10, 8)
    assert pk.shape == (64, 2, 10, 4)
    np.testing.assert_array_equal(pi[:, 0], img[bal["position_1"]])
    np.testing.assert_array_equal(pi[:, 1], img[bal["position_2"]])


def test_pairs_csv_roundtrip(tmp_path, rng):
    from med_tpu.data.siamese import load_pairs_csv, save_pairs_csv

    gest, err, subj = random_windows(rng, 40)
    pairs = create_train_pairs(gest, err, subj)
    path = str(tmp_path / "train_pairs.csv")
    save_pairs_csv(path, pairs, subj, gest)
    loaded = load_pairs_csv(path)
    for k in ("position_1", "position_2", "instance_1", "instance_2", "label"):
        np.testing.assert_array_equal(loaded[k], pairs[k])
    # header matches the reference layout
    header = open(path).readline().strip().split(",")
    assert header == ["subject_1", "gesture_label_1", "position_1",
                      "instance_1", "subject_2", "gesture_label_2",
                      "position_2", "instance_2", "label"]
