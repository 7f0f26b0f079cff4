"""ResNet fine-tune driver integration test on a tiny raw-frame fold."""

import os

import numpy as np
import pytest

from med_tpu.cli import resnet_finetune
from med_tpu.data.trials import Trial, save_trial_npz

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


def make_raw_fold(tmp_path, rng, n_trials=3, frames=16, hw=32):
    fold = tmp_path / "1Out"
    fold.mkdir(parents=True)
    names = []
    for i in range(n_trials):
        name = f"Needle_Passing_B00{i + 1}"
        names.append(name + ".npz")
        T = frames
        imgs = rng.integers(0, 256, size=(T, hw, hw, 3)).astype(np.uint8)
        e = np.zeros((T, 5), np.int64)
        e[: T // 2, 4] = 1
        imgs[: T // 2] //= 2  # learnable brightness signal
        kin = rng.normal(size=(T, 26)).astype(np.float32)
        g = np.ones(T, np.int64)
        save_trial_npz(str(fold / names[-1]), Trial(name, imgs.astype(np.float32), kin, g, e))
    with open(fold / "train.csv", "w") as f:
        f.write("\n".join(names[:-1]))
    with open(fold / "test.csv", "w") as f:
        f.write(names[-1])
    return str(tmp_path)


def test_resnet_finetune_and_export(tmp_path, rng):
    data_root = make_raw_fold(tmp_path / "raw", rng)
    out_root = str(tmp_path / "features")
    resnet_finetune.main(
        ["--data-root", data_root, "--output-root", out_root,
         "--folds", "1Out", "--runs-root", str(tmp_path / "runs"),
         "--batch-size", "8", "--n-epochs", "1"]
    )
    # exported features are standard trial files
    from med_tpu.data.trials import load_fold

    img, kin, g, e, subj = load_fold(os.path.join(out_root, "1Out"), "test.csv")
    assert img.shape == (16, 2048)
    assert kin.shape == (16, 26)
