"""Generate a JIGSAWS-shaped synthetic dataset for end-to-end demos.

Produces LOSO-style folds with per-trial .npz files, realistic sizes
(~1000 frames/trial at 5 Hz, gesture runs, block-structured error labels
with a learnable kinematics signature), and fold statistics. Not a parity
dataset — the real JIGSAWS data is not distributable — but it exercises the
entire production path at realistic scale.

Usage: python scripts/make_synth_dataset.py --out demo_data [--folds 5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from med_tpu.data.trials import (  # noqa: E402
    Trial,
    compute_fold_stats,
    save_fold_stats,
    save_trial_npz,
)

SUBJECT_LETTERS = "BCDEFGHI"


def make_trial(rng, name: str) -> Trial:
    T = int(rng.integers(900, 1020))
    # gesture runs (G1..G8, like the observed set)
    g = np.zeros(T, np.int64)
    t = 0
    while t < T:
        run = int(rng.integers(15, 60))
        g[t : t + run] = int(rng.integers(1, 9))
        t += run
    # block errors aligned to gesture runs
    e = np.zeros((T, 5), np.int64)
    boundaries = np.flatnonzero(np.diff(g) != 0)
    starts = np.concatenate([[0], boundaries + 1])
    ends = np.concatenate([boundaries + 1, [T]])
    for s, en in zip(starts, ends):
        if rng.random() < 0.45:  # erroneous gesture instance
            which = rng.choice(4, p=[0.25, 0.1, 0.4, 0.25])
            e[s:en, which] = 1
            if rng.random() < 0.15:  # occasional double error
                e[s:en, int(rng.integers(0, 4))] = 1
            e[s:en, 4] = 1
    img = rng.normal(size=(T, 2048)).astype(np.float32)
    kin = rng.normal(size=(T, 26)).astype(np.float32)
    # learnable but noisy signatures
    img[:, :64] += e[:, 4:5] * 0.8
    kin[:, :6] += e[:, 4:5] * 1.2
    kin[:, 6:10] += e[:, 2:3] * 0.8   # MA signature
    kin[:, 10:13] += e[:, 0:1] * 0.8  # OOV signature
    return Trial(name, img, kin, g, e)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo_data")
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--trials-per-fold", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    trials = {}
    n_total = args.folds * args.trials_per_fold
    for i in range(n_total):
        letter = SUBJECT_LETTERS[i % len(SUBJECT_LETTERS)]
        name = f"Needle_Passing_{letter}{i:03d}"
        trials[name] = make_trial(rng, name)

    names = list(trials)
    for f in range(args.folds):
        fold = f"{f + 1}Out"
        fold_dir = os.path.join(args.out, fold)
        os.makedirs(fold_dir, exist_ok=True)
        test_names = names[f * args.trials_per_fold // 5 * 5:][: max(2, args.trials_per_fold // 5)]
        test_names = names[f::args.folds][: max(2, args.trials_per_fold // 5)]
        train_names = [n for n in names if n not in test_names][
            : args.trials_per_fold - len(test_names)
        ]
        for split, split_names in (("train", train_names), ("test", test_names)):
            with open(os.path.join(fold_dir, f"{split}.csv"), "w") as fh:
                fh.write("\n".join(n + ".npz" for n in split_names))
            for n in split_names:
                save_trial_npz(os.path.join(fold_dir, n + ".npz"), trials[n])
        tr_img = np.concatenate([trials[n].image_feats for n in train_names])
        tr_kin = np.concatenate([trials[n].kinematics for n in train_names])
        save_fold_stats(fold_dir, compute_fold_stats(tr_img, tr_kin))
        print(f"{fold}: {len(train_names)} train / {len(test_names)} test trials")


if __name__ == "__main__":
    main()
