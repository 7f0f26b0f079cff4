"""Typed experiment configuration.

The reference drives every experiment from a single untyped ``exp_kwargs``
dict defined per notebook (~30 keys; reference train_window.ipynb cell 1 and
train_frame.ipynb cell 1). This module replaces that with a dataclass that
covers the same key set, derives the quantities the notebooks compute inline
(``in_features_dict``, window size/stride), and adds TPU-specific knobs
(compute dtype, mesh shape) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Error taxonomy. The raw per-frame label vector has 5 columns
# (reference MED/dataset/preprocessing_utils.py:686-693):
RAW_ERROR_COLUMNS = (
    "Out_Of_View",
    "Needle_Drop",
    "Multiple_Attempts",
    "Needle_Position",
    "Error",  # global any-error flag
)

# Powerset label classes after `powerset_error_labels`
# (reference MED/dataset/dataset_utils.py:760-845): 7 columns.
POWERSET_CLASSES = (
    "No Error",                            # 0
    "Out_Of_View",                         # 1 (incl. OOV+ND)
    "Multiple_Attempts",                   # 2 (incl. MA+ND)
    "Needle_Position",                     # 3 (incl. OOV+NP)
    "Out_Of_View_Multiple_Attempts",       # 4
    "Multiple_Attempts_Needle_Position",   # 5
    "global",                              # 6 (any error)
)

# error_type -> column in the powerset label matrix
# (reference MED/modeling/modeling_utils.py:161-170).
ERROR_TYPE_TO_COLUMN = {
    "No Error": 0,
    "Out_Of_View": 1,
    "Multiple_Attempts": 2,
    "Needle_Position": 3,
    "Out_Of_View_Multiple_Attempts": 4,
    "Multiple_Attempts_Needle_Position": 5,
    "global": -1,
    "all_errors": (0, 1, 2, 3, 4, 5),
}

# Subject letter -> skill level (reference MED/dataset/CustomFrameDataset.py:26-34).
SKILL_LEVELS = {
    "B": "Novice", "C": "Intermediate", "D": "Expert", "E": "Expert",
    "F": "Intermediate", "G": "Novice", "H": "Novice", "I": "Expert",
}
SKILL_ORDER = ("Novice", "Intermediate", "Expert")

# LOSO folds (supertrial-out) and the declared-but-unused LOUO subject-out
# variant (reference train_window.ipynb cell 1: `out1`, `out2`).
LOSO_FOLDS = ("1Out", "2Out", "3Out", "4Out", "5Out")
LOUO_FOLDS = ("Bout", "Cout", "Dout", "Eout", "Fout", "Gout", "Hout", "Iout")

MODEL_NAMES = (
    "SimpleCNN", "SimpleLSTM", "Siamese_CNN", "Siamese_LSTM",
    "TeCNo", "TransSVNet", "COG",
)


def compute_window_size_stride(frequency: int = 30) -> Tuple[int, int]:
    """2-second windows with 4/3-second stride at the given sampling rate.

    Matches reference MED/dataset/dataset_utils.py:262-279 (5 Hz -> (10, 6),
    15 Hz -> (30, 20)).
    """
    return int(2 * frequency), int(4 / 3 * frequency)


@dataclasses.dataclass
class ExperimentConfig:
    """Full experiment configuration (reference ``exp_kwargs`` key set)."""

    # --- task selection ---
    error_type: str = "global"        # 'global' | 'all_errors' | 'sequential' | specific name
    dataset_type: str = "window"      # 'window' | 'frame'
    model_name: str = "SimpleCNN"
    data_type: str = "multimodal"     # 'multimodal' | 'video' | 'kinematics'
    frequency: int = 5                # Hz of the preprocessed data

    # --- optimization (reference train_window.ipynb cell 1) ---
    n_epochs: int = 15
    batch_size: int = 512
    lr: float = 5e-4
    weight_decay: float = 5e-3
    lr_scheduler: bool = True         # cosine annealing to 1e-6 over n_epochs
    pos_weight: bool = False          # BCE pos_weight / CE class weights
    es_weight_scale: float = 1.5      # ES: divide inverse-freq weights of
                                      # powerset classes 1/3/4/5 by this when
                                      # pos_weight is on (train_window_ES
                                      # .ipynb cell 2 "/1.5"); 1.0 disables
    loss_or_f1: str = "f1"            # best-checkpoint selection criterion
    seed: int = 42

    # --- heads / dims ---
    out_features: int = 1             # 1 binary-window, 2 frame, 6 ES, 5 sequential
    video_dims: int = 32              # FeatureExtractor output dim (2048 = bypass)
    num_layers: int = 3               # SimpleLSTM depth
    hidden_size: int = 128            # SimpleLSTM hidden size

    # --- siamese (reference dataset_utils.py:282-353, 534-757) ---
    siamese: bool = False
    n_comparisons: int = 20
    n_pairs: int = 20000

    # --- label handling ---
    delete_ND: bool = False           # drop Needle-Drop frames/windows

    # --- frame models (reference train_frame.ipynb cell 1) ---
    mstcn_stages: int = 2             # TeCNo stages; COG uses 8 (= #outputs)
    mstcn_layers: int = 8
    mstcn_f_maps: int = 64
    mstcn_f_dim: int = 2048           # set from data_type via in_features()
    mstcn_causal_conv: bool = True
    num_R: int = 3                    # COG refinement stages
    num_layers_R: int = 10
    num_layers_Basic: int = 11
    d_model: int = 64
    d_q: int = 8
    sequence_length: int = 30         # len_q: local attention window
    smooth_lambda: float = 0.15       # COG truncated-MSE smoothing weight
    use_all_gestures: bool = True
    use_skill_prompt: bool = False
    SRM: bool = False                 # skill-reasoning module

    # --- staged pipelines ---
    run_id: Optional[str] = None      # upstream run (TeCNo for TransSVNet, binary stage)
    use_true_binary_labels_train: bool = True

    # --- bookkeeping ---
    return_train_preds: bool = False
    save_local: bool = False

    # --- TPU-native knobs (no reference counterpart) ---
    compute_dtype: str = "float32"    # 'float32' | 'bfloat16' (matmuls)
    mesh_shape: Optional[Tuple[int, ...]] = None   # data-parallel mesh, None = all devices
    use_pallas: bool = True           # Pallas kernels for hot ops (XLA fallback off-TPU)
    prefetch_depth: int = 2           # host->device double buffering
    fused_epoch: bool = True          # window families: whole epoch as one lax.scan
    fused_run: bool = True            # window families: whole TRAINING RUN (all
                                      # epochs + evals + best-ckpt selection) as
                                      # one program (train/fused.py FusedWindowRun)
    trial_batch: int = 1              # frame families: trials per step (vmapped);
                                      # >1 averages gradients across trials — a
                                      # TPU scaling option the reference's
                                      # batch_size=1 regime does not have
    max_frames: int = 4096            # frame-model padding bucket ceiling
    flat_params: bool = False         # frame families: store params as ONE
                                      # flat vector (state.params={'flat':v}).
                                      # Measured SLOWER on v5e (COG step 4.5
                                      # vs 3.0 ms): the per-step unflatten
                                      # slice fan-out does not fuse into the
                                      # forward. Kept as an option;
                                      # checkpoints always see trees
                                      # (Experiment.params_tree)
    fold_pad_quantum: int = 512       # whole-run fusion: pad each fold's
                                      # window count up to a multiple of this
                                      # so LOSO folds of similar size share
                                      # ONE compiled program (surplus steps
                                      # are fully-masked no-ops); 0 disables

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.model_name not in MODEL_NAMES:
            raise ValueError(f"unknown model_name {self.model_name!r}; one of {MODEL_NAMES}")
        if self.data_type not in ("multimodal", "video", "kinematics"):
            raise ValueError(f"unknown data_type {self.data_type!r}")
        if self.dataset_type not in ("window", "frame"):
            raise ValueError(f"unknown dataset_type {self.dataset_type!r}")
        if self.error_type not in ERROR_TYPE_TO_COLUMN and self.error_type != "sequential":
            raise ValueError(f"unknown error_type {self.error_type!r}")

    # Derived quantities ------------------------------------------------
    @property
    def window_size(self) -> int:
        return compute_window_size_stride(self.frequency)[0]

    @property
    def stride(self) -> int:
        return compute_window_size_stride(self.frequency)[1]

    def in_features(self) -> int:
        """Model input width per data_type (reference train_window.ipynb cell 1
        ``in_features_dict``)."""
        video = self.video_dims
        return {"multimodal": video + 26, "video": video, "kinematics": 26}[self.data_type]

    def uses_feature_extractor(self) -> bool:
        """The 2048->video_dims MLP is used unless kinematics-only or raw
        2048-d features are fed directly (reference modeling_utils.py:58-75)."""
        return self.data_type != "kinematics" and self.video_dims != 2048

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["window_size"] = self.window_size
        d["stride"] = self.stride
        d["in_features"] = self.in_features()
        return d
