"""Golden tests for raw consensus error-CSV ingestion.

The oracle is a literal transcription of the reference ``process_errors``
flow (preprocessing_utils.py:314-497) for one trial: per-frame table over the
transcription range, per-error file scan with the NP name munging, substring
match, segment paint (later-wins), NaN->0 fill, kinematics-frame subsample.
The fixture covers NP-vs-Suturing naming, overlapping segments with an
explicit-0 overwrite, unlabeled-frame zero-fill, and frequency subsampling.
"""

import os

import numpy as np

from med_tpu.config import RAW_ERROR_COLUMNS
from med_tpu.data.consensus import (
    ERROR_DICT_NEEDLE_PASSING,
    ERROR_DICT_SUTURING,
    find_consensus_folder,
    segments_from_consensus_csvs,
)
from med_tpu.data.preprocessing import errors_for_frames


def oracle_process_errors(folder_errors, trial_name, task_type, error_dict,
                          transcript, kin_frames):
    """Literal reference semantics (preprocessing_utils.py:353-497)."""
    start_f = min(s for s, _, _ in transcript)
    end_f = max(e for _, e, _ in transcript)
    index = list(range(start_f, end_f + 1))
    table = {e: {f: None for f in index} for e in error_dict}

    column = "name" if task_type == "NP" else "files"
    import csv as _csv

    for error, error_name in error_dict.items():
        if error != "Error":
            folder = os.path.join(folder_errors, "Error_specific")
            files = sorted(f for f in os.listdir(folder)
                           if error_name in f and f.endswith(".csv"))
        else:
            folder = folder_errors
            files = sorted(f for f in os.listdir(folder_errors)
                           if f.startswith(f"error_{task_type}")
                           and f.endswith(".csv"))
        if task_type == "NP" and error != "Error" and error_name != "attempts":
            tname = trial_name.replace("Needle_Passing", "NeedlePassing")
        else:
            tname = trial_name
        for fname in files:
            with open(os.path.join(folder, fname), newline="") as fh:
                for row in _csv.DictReader(fh):
                    name = row[column]
                    if tname in name:
                        import re

                        s = int(re.search(r"_(\d+)_", name).group(1))
                        e = int(re.search(r"_(\d+)\.avi", name).group(1))
                        v = int(float(row["label_err1_nor0"]))
                        for f in index:
                            if s <= f <= e:
                                table[error][f] = v
    # fillna(0) + keep only kinematics frames inside the transcript range
    rows = []
    for f in kin_frames:
        if start_f <= f <= end_f:
            rows.append([table[e][f] or 0 for e in error_dict])
    return np.asarray(rows, np.int64)


def _write_csv(path, column, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"{column},label_err1_nor0\n")
        for name, v in rows:
            f.write(f"{name},{v}\n")


def make_np_release(root):
    """Needle-Passing consensus fixture exercising every quirk."""
    es = os.path.join(root, "Error_specific")
    # specific errors use the NO-underscore trial naming…
    _write_csv(os.path.join(es, "G1_OutofView.csv"), "name",
               [("NeedlePassing_B001_20_40.avi", 1),
                ("NeedlePassing_C002_10_30.avi", 1)])      # other trial
    # …overlapping later file with an explicit 0 (later-wins overwrite)
    _write_csv(os.path.join(es, "G2_OutofView.csv"), "name",
               [("NeedlePassing_B001_30_50.avi", 0)])
    # attempts CSVs use the UNDERSCORE naming
    _write_csv(os.path.join(es, "G1_attempts.csv"), "name",
               [("Needle_Passing_B001_60_70.avi", 1)])
    _write_csv(os.path.join(es, "G3_needle_position.csv"), "name",
               [("NeedlePassing_B001_12_15.avi", 1)])
    # global Error files use the underscore naming + error_NP_ prefix
    _write_csv(os.path.join(root, "error_NP_G1.csv"), "name",
               [("Needle_Passing_B001_80_90.avi", 1)])
    _write_csv(os.path.join(root, "error_NP_G2.csv"), "name",
               [("Needle_Passing_B001_85_95.avi", 1)])
    # Needle_Drop: no CSVs at all -> zero fill


def test_np_consensus_golden(tmp_path):
    root = str(tmp_path / "np")
    make_np_release(root)
    transcript = [(10, 60, 1), (61, 100, 2)]
    kin_frames = np.arange(4, 121, 6)  # subsampled, extends past both ends

    segments = segments_from_consensus_csvs(root, "Needle_Passing_B001")
    got, keep = errors_for_frames(transcript, segments, kin_frames)
    want = oracle_process_errors(root, "Needle_Passing_B001", "NP",
                                 ERROR_DICT_NEEDLE_PASSING, transcript,
                                 kin_frames)
    np.testing.assert_array_equal(got, want)

    # sanity against hand-derived values on the kept frames
    kept = kin_frames[keep]
    oov = got[:, RAW_ERROR_COLUMNS.index("Out_Of_View")]
    nd = got[:, RAW_ERROR_COLUMNS.index("Needle_Drop")]
    ma = got[:, RAW_ERROR_COLUMNS.index("Multiple_Attempts")]
    err = got[:, RAW_ERROR_COLUMNS.index("Error")]
    np.testing.assert_array_equal(oov, ((kept >= 20) & (kept <= 29)))  # 30-50 overwritten to 0
    np.testing.assert_array_equal(nd, 0)
    np.testing.assert_array_equal(ma, ((kept >= 60) & (kept <= 70)))
    np.testing.assert_array_equal(err, ((kept >= 80) & (kept <= 95)))


def test_suturing_consensus_golden(tmp_path):
    root = str(tmp_path / "s")
    es = os.path.join(root, "Error_specific")
    # Suturing: plain trial naming, 'files' column, lowercase error names
    _write_csv(os.path.join(es, "G1_outofview.csv"), "files",
               [("Suturing_C002_5_8.avi", 1)])
    _write_csv(os.path.join(es, "G2_needledrop.csv"), "files",
               [("Suturing_C002_9_12.avi", 1),
                ("Suturing_D003_5_20.avi", 1)])
    _write_csv(os.path.join(es, "G1_position.csv"), "files",
               [("Suturing_C002_3_6.avi", 1)])
    _write_csv(os.path.join(root, "error_S_G1.csv"), "files",
               [("Suturing_C002_2_14.avi", 1)])
    transcript = [(2, 20, 3)]
    kin_frames = np.arange(1, 25)

    segments = segments_from_consensus_csvs(root, "Suturing_C002")
    got, keep = errors_for_frames(transcript, segments, kin_frames)
    want = oracle_process_errors(root, "Suturing_C002", "S",
                                 ERROR_DICT_SUTURING, transcript, kin_frames)
    np.testing.assert_array_equal(got, want)
    assert got[:, RAW_ERROR_COLUMNS.index("Error")].sum() == 13  # frames 2..14


def test_find_consensus_folder(tmp_path):
    raw = str(tmp_path)
    per_task = os.path.join(raw, "consensus_errors", "Needle_Passing",
                            "Error_specific")
    os.makedirs(per_task)
    assert find_consensus_folder(raw, "Needle_Passing_B001") == \
        os.path.join(raw, "consensus_errors", "Needle_Passing")
    # Suturing release absent -> flat layout also absent -> None
    assert find_consensus_folder(raw, "Suturing_B001") is None
