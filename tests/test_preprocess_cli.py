"""End-to-end test of the offline preprocessing driver: raw JIGSAWS-style
files -> per-trial .npz folds -> window pipeline."""

import json
import os

import numpy as np

from med_tpu.cli import preprocess as cli_pre
from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import build_window_fold


def make_raw_trial(root, name, rng, n30=600):
    """76-col kinematics @30Hz, transcription, error segments."""
    os.makedirs(os.path.join(root, "kinematics"), exist_ok=True)
    os.makedirs(os.path.join(root, "transcriptions"), exist_ok=True)
    os.makedirs(os.path.join(root, "error_segments"), exist_ok=True)

    kin = rng.normal(size=(n30, 76))
    for base in (41, 60):  # identity rotation blocks (0-based R start cols)
        kin[:, base : base + 9] = np.eye(3).ravel()
    np.savetxt(os.path.join(root, "kinematics", name + ".txt"), kin)

    # gestures in [60, 540], include a gesture-11 run that must be purged
    rows = [(60, 179, 1), (180, 299, 2), (300, 359, 11), (360, 449, 3),
            (450, 540, 4)]
    with open(os.path.join(root, "transcriptions", name + ".txt"), "w") as f:
        for s, e, g in rows:
            f.write(f"{s} {e} G{g}\n")

    segments = {
        "Out_Of_View": [[180, 299, 1]],
        "Error": [[180, 299, 1], [360, 449, 1]],
        "Multiple_Attempts": [[360, 449, 1]],
    }
    with open(os.path.join(root, "error_segments", name + ".json"), "w") as f:
        json.dump(segments, f)


def test_trial_purge_mask_golden(rng):
    """Literal oracle for the reference's per-trial gesture-9 purge
    (data_processing.ipynb 'Delete Gesture 9 from Needle_Passing_C005.pkl':
    indices_to_delete = [i for i, g in enumerate(g_labels) if g == 9])."""
    from med_tpu.data.preprocessing import trial_purge_mask

    g = rng.integers(1, 12, size=200)
    keep = trial_purge_mask("Needle_Passing_C005", g)
    indices_to_delete = [i for i, gg in enumerate(g) if gg == 9]
    assert sorted(np.nonzero(~keep)[0].tolist()) == indices_to_delete
    # only that one trial carries a rule
    assert trial_purge_mask("Needle_Passing_B001", g).all()
    assert trial_purge_mask("Suturing_C005", g).all()
    # override table
    custom = trial_purge_mask("X", g, {"X": (3, 9)})
    assert (custom == ~np.isin(g, (3, 9))).all()


def test_preprocess_purges_gesture9_from_corrupt_trial(tmp_path, rng):
    """The CLI drops gesture-9 frames from Needle_Passing_C005 only
    (reference data_processing.ipynb 'Delete Gesture 9' cell), and
    --trial-purge none disables the rule."""
    for flags, expect_g9 in (([], False), (["--trial-purge", "none"], True)):
        raw = str(tmp_path / f"raw{expect_g9}")
        out = str(tmp_path / f"folds{expect_g9}")
        names = ["Needle_Passing_C005", "Needle_Passing_B001"]
        for n in names:
            make_raw_trial(raw, n, rng)
            # append a gesture-9 segment to each transcription
            with open(os.path.join(raw, "transcriptions", n + ".txt"), "a") as f:
                f.write("541 590 G9\n")
        spec = {"1Out": {"train": names[:1], "test": names[1:]}}
        spec_path = str(tmp_path / f"folds{expect_g9}.json")
        with open(spec_path, "w") as f:
            json.dump(spec, f)
        cli_pre.main(["--raw-root", raw, "--output-root", out,
                      "--frequency", "5", "--fold-spec", spec_path] + flags)

        from med_tpu.data.trials import load_trial

        fold_dir = os.path.join(out, "1Out")
        corrupt = load_trial(os.path.join(fold_dir, names[0] + ".npz"))
        clean = load_trial(os.path.join(fold_dir, names[1] + ".npz"))
        assert (9 in corrupt.g_labels) == expect_g9
        assert 9 in clean.g_labels  # the rule is per-trial, not global


def test_preprocess_to_training(tmp_path, rng):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "folds")
    names = [f"Needle_Passing_B00{i}" for i in range(1, 5)]
    for n in names:
        make_raw_trial(raw, n, rng)
    spec = {"1Out": {"train": names[:3], "test": names[3:]}}
    spec_path = str(tmp_path / "folds.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    cli_pre.main(["--raw-root", raw, "--output-root", out,
                  "--frequency", "5", "--fold-spec", spec_path])

    fold_dir = os.path.join(out, "1Out")
    assert os.path.exists(os.path.join(fold_dir, "stats.npz"))

    from med_tpu.data.trials import load_trial

    t = load_trial(os.path.join(fold_dir, names[0] + ".npz"))
    # 5 Hz subsample of frames 60..540, gesture-11 frames purged
    assert t.kinematics.shape[1] == 26
    assert not np.isin(t.g_labels, [10, 11]).any()
    assert t.e_labels.shape[1] == 5
    # error painting: OOV active exactly on gesture-2 frames
    g2 = t.g_labels == 2
    assert (t.e_labels[g2, 0] == 1).all()
    assert (t.e_labels[~g2, 0] == 0).all()
    assert (t.e_labels[:, 4] == ((t.g_labels == 2) | (t.g_labels == 3))).all()

    # the produced fold feeds the training pipeline directly
    cfg = ExperimentConfig(model_name="SimpleCNN", data_type="kinematics",
                           batch_size=16)
    train_fold, test_fold = build_window_fold(fold_dir, cfg)
    assert len(train_fold) > 0 and len(test_fold) > 0
    assert train_fold.e_powerset.shape[1] == 7
