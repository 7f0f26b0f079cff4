"""Stage-2 sequential window training (reference
train_window_ES_sequential.ipynb): a 5-class error-specific model trained on
true-error windows only; at eval, a frozen per-fold *binary* stage-1 model
(from a previous train_window run, ``--run-id``) gates the 5-class head —
windows it predicts clean are forced to class 0
(modeling_utils.py:543-684, 907-1053).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import ExperimentConfig
from ..tracking import RunTracker
from ..train.checkpoint import load_best_checkpoint
from ..train.engine import Experiment
from ..train.loop import evaluate_window_fold
from .common import base_parser, config_from_args, run_window_folds


def _binary_cfg_from_run(runs_root: str, run_id: str) -> ExperimentConfig:
    run_dir = RunTracker.find_run(runs_root, run_id)
    with open(os.path.join(run_dir, "params.json")) as f:
        params = json.load(f)
    fields = {k: v for k, v in params.items()
              if k in ExperimentConfig.__dataclass_fields__}
    return ExperimentConfig(**fields)


def _gate_fn(args, cfg_seq):
    """Run the frozen binary stage over this fold's (ND-filtered) test
    windows to produce the eval gate."""
    runs_root = args.runs_root
    run_dir = RunTracker.find_run(runs_root, args.run_id)
    cfg_bin = _binary_cfg_from_run(runs_root, args.run_id)
    # the gate must be computed on the sequential stage's window set
    cfg_bin = cfg_bin.replace(delete_ND=cfg_seq.delete_ND,
                              batch_size=cfg_seq.batch_size)
    exp_bin = Experiment(cfg_bin)

    def fn(out, train_fold, test_fold):
        ckpt = load_best_checkpoint(
            os.path.join(run_dir, "checkpoints"), args.setting, out,
            model_name=cfg_bin.model_name,
        )
        state = exp_bin.init_state(
            __import__("jax").random.key(0),
            _first_batch(cfg_bin, test_fold),
        )
        state = state.replace(params=ckpt["params"],
                              batch_stats=ckpt.get("batch_stats", {}))
        ev = evaluate_window_fold(cfg_bin, exp_bin, state, test_fold)
        gate_test = np.asarray(ev["preds"]).astype(np.float32)
        # train gate = true labels (use_true_binary_labels_train)
        gate_train = (train_fold.labels_for("sequential") != 0).astype(np.float32)
        return {"train": {"gate": gate_train}, "test": {"gate": gate_test}}

    return fn


def _first_batch(cfg, fold):
    from ..data.datasets import window_batches

    b = next(window_batches(fold, cfg, shuffle=False))
    return {k: v for k, v in b.items() if not k.startswith("_")}


def main(argv=None):
    p = base_parser(__doc__)
    p.set_defaults(model_name="SimpleLSTM", delete_ND=True)
    args = p.parse_args(argv)
    if not args.run_id:
        raise SystemExit("--run-id of the trained binary stage is required")
    cfg = config_from_args(args, error_type="sequential",
                           dataset_type="window", out_features=5)
    run_window_folds(args, cfg, extras_fn=_gate_fn(args, cfg))


if __name__ == "__main__":
    main()
