"""Array-based datasets + fixed-shape batch iterators.

Replaces the reference's three torch Dataset classes + DataLoaders
(CustomWindowDataset / CustomFrameDataset / SiameseWindowDataset). The whole
5 Hz dataset fits in host RAM (the reference also materializes it), so folds
are built once into contiguous numpy arrays; iteration yields fixed-shape
batches (last batch zero-padded with an example mask) so every jitted step
compiles exactly once per shape family.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import ERROR_TYPE_TO_COLUMN, ExperimentConfig
from .labels import class_distributions, powerset_error_labels, skill_one_hot
from .trials import (
    Trial,
    compute_fold_stats,
    load_fold,
    load_fold_stats,
    load_fold_trials,
)
from .windowing import window_data


@dataclasses.dataclass
class WindowFold:
    """One split of windowed, powerset-labeled, standardized data
    (reference CustomWindowDataset, CustomWindowDataset.py:3-74)."""

    images: np.ndarray        # (Nw, W, 2048) standardized
    kinematics: np.ndarray    # (Nw, W, 26) standardized
    g_labels: np.ndarray      # (Nw, 1)
    e_powerset: np.ndarray    # (Nw, 7)
    subjects: np.ndarray      # (Nw,) object
    e_raw: Optional[np.ndarray] = None   # (Nw, 5) raw multi-hot error labels

    def __len__(self):
        return len(self.images)

    @property
    def binary_error_distribution(self) -> tuple:
        return class_distributions(self.e_powerset)[0]

    @property
    def specific_error_distribution(self) -> list:
        return class_distributions(self.e_powerset)[1]

    def labels_for(self, error_type: str) -> np.ndarray:
        """Integer training labels per error_type (reference
        define_error_labels + the argmax in the ES/sequential loops)."""
        if error_type == "global":
            return self.e_powerset[:, -1].astype(np.int64)
        if error_type in ("all_errors", "sequential"):
            return np.argmax(self.e_powerset[:, :6], axis=1).astype(np.int64)
        col = ERROR_TYPE_TO_COLUMN[error_type]
        return self.e_powerset[:, col].astype(np.int64)


def standardize(x: np.ndarray, stats: Dict[str, np.ndarray]) -> np.ndarray:
    return ((x - stats["mean"]) / stats["std"]).astype(np.float32)


def build_window_fold(
    fold_dir: str,
    cfg: ExperimentConfig,
    video_dir: Optional[str] = None,
    stats: Optional[dict] = None,
) -> Tuple[WindowFold, WindowFold]:
    """load -> window -> powerset -> ND-filter -> standardize, for both
    splits (reference retrieve_dataloaders_window, dataset_utils.py:405-531)."""
    out = []
    if stats is None:
        try:
            stats = load_fold_stats(fold_dir)
        except FileNotFoundError:
            img, kin, _, _, _ = load_fold(fold_dir, "train.csv", video_dir)
            stats = compute_fold_stats(img, kin)
    for csv in ("train.csv", "test.csv"):
        img, kin, g, e, subj = load_fold(fold_dir, csv, video_dir)
        iw, kw, gw, ew, sw = window_data(
            img, kin, g, e, subj, cfg.window_size, cfg.stride
        )
        pw, nd_mask = powerset_error_labels(ew, delete_ND=cfg.delete_ND)
        if cfg.delete_ND:
            keep = ~nd_mask
            iw, kw, gw, pw, sw, ew = (
                iw[keep], kw[keep], gw[keep], pw[keep], sw[keep], ew[keep]
            )
        out.append(
            WindowFold(
                images=standardize(iw, stats["image"]),
                kinematics=standardize(kw, stats["kinematics"]),
                g_labels=gw,
                e_powerset=pw,
                subjects=sw,
                e_raw=np.asarray(ew),
            )
        )
    return out[0], out[1]


def window_batches(
    fold: WindowFold,
    cfg: ExperimentConfig,
    shuffle: bool,
    seed: int = 42,
    epoch: int = 0,
    extras: Optional[Dict[str, np.ndarray]] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-shape batches with padding mask. Shuffling is deterministic in
    (seed, epoch), standing in for the reference's seeded DataLoader
    generator (dataset_utils.py:526-527). ``extras`` adds per-window arrays
    (e.g. the sequential stage's binary gate) sliced alongside."""
    n = len(fold)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    labels = fold.labels_for(cfg.error_type)
    B = cfg.batch_size
    for start in range(0, n, B):
        take = idx[start : start + B]
        pad = B - len(take)
        sel = np.concatenate([take, np.zeros(pad, np.int64)]) if pad else take
        mask = np.concatenate([np.ones(len(take), np.float32),
                               np.zeros(pad, np.float32)])
        batch = {
            "images": fold.images[sel],
            "kinematics": fold.kinematics[sel],
            "labels": labels[sel],
            "mask": mask,
            "_index": sel,
            "_valid": len(take),
        }
        if extras:
            for k, v in extras.items():
                batch[k] = np.asarray(v)[sel]
        yield batch


def n_window_batches(fold: WindowFold, cfg: ExperimentConfig) -> int:
    return -(-len(fold) // cfg.batch_size)


# ----------------------------------------------------------------- frames
@dataclasses.dataclass
class FrameTrial:
    """One whole processed trial (reference CustomFrameDataset.__getitem__:
    powerset + ND filter + kinematics standardization (images are NOT
    standardized in the frame pipeline — CustomFrameDataset.py:93-95) +
    per-frame skill one-hot)."""

    name: str
    images: np.ndarray        # (T, 2048) raw
    kinematics: np.ndarray    # (T, 26) standardized
    g_labels: np.ndarray      # (T,)
    e_powerset: np.ndarray    # (T, 7)
    skill: np.ndarray         # (T, 3)
    e_raw: Optional[np.ndarray] = None   # (T, 5)

    @property
    def n_frames(self):
        return len(self.kinematics)

    def labels_for(self, error_type: str) -> np.ndarray:
        if error_type == "global":
            return self.e_powerset[:, -1].astype(np.int64)
        if error_type in ("all_errors", "sequential"):
            return np.argmax(self.e_powerset[:, :6], axis=1).astype(np.int64)
        col = ERROR_TYPE_TO_COLUMN[error_type]
        return self.e_powerset[:, col].astype(np.int64)


def build_frame_fold(
    fold_dir: str,
    cfg: ExperimentConfig,
    csv_name: str,
    video_dir: Optional[str] = None,
    stats: Optional[dict] = None,
) -> List[FrameTrial]:
    if stats is None:
        try:
            stats = load_fold_stats(fold_dir)
        except FileNotFoundError:
            img, kin, _, _, _ = load_fold(fold_dir, "train.csv", video_dir)
            stats = compute_fold_stats(img, kin)
    trials = load_fold_trials(fold_dir, csv_name, video_dir)
    out = []
    for t in trials:
        pw, nd_mask = powerset_error_labels(t.e_labels, delete_ND=True)
        if cfg.delete_ND:
            keep = ~nd_mask
        else:
            # reference always computes the mask but only filters when
            # delete_ND (CustomFrameDataset.py:84-91 passes delete_ND=True to
            # powerset but gates the filtering on self.delete_ND)
            pw, _ = powerset_error_labels(t.e_labels, delete_ND=False)
            keep = np.ones(t.n_frames, bool)
        out.append(
            FrameTrial(
                name=t.name,
                images=t.image_feats[keep].astype(np.float32),
                kinematics=standardize(t.kinematics[keep], stats["kinematics"]),
                g_labels=t.g_labels[keep],
                e_powerset=pw[keep],
                skill=skill_one_hot(t.name, int(keep.sum())),
                e_raw=t.e_labels[keep],
            )
        )
    return out


def bucket_length(t: int, bucket: int = 256, cap: int = 8192) -> int:
    return min(max(-(-t // bucket) * bucket, bucket), cap)


def frame_batch(
    trial: FrameTrial,
    cfg: ExperimentConfig,
    bucket: int = 256,
    gate: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """One trial as a padded fixed-shape frame batch."""
    T = trial.n_frames
    Tp = bucket_length(T, bucket, cfg.max_frames)
    T = min(T, Tp)

    def pad(x, value=0):
        if x.ndim == 1:
            return np.pad(x[:T], (0, Tp - T), constant_values=value)
        return np.pad(x[:T], ((0, Tp - T), (0, 0)), constant_values=value)

    labels = trial.labels_for(cfg.error_type)
    batch = {
        "images": pad(trial.images)[None],
        "kinematics": pad(trial.kinematics)[None],
        "labels": pad(labels).astype(np.int64),
        "mask": np.pad(np.ones(T, np.float32), (0, Tp - T)),
        "true_len": np.asarray(T, np.int32),
        "_name": trial.name,
        "_gestures": pad(trial.g_labels),
    }
    if gate is not None:
        batch["gate"] = pad(gate.astype(np.float32))
    return batch
