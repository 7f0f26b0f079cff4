"""Stage-2 sequential frame-level COG (reference
train_frame_ES_sequential.ipynb): a 5-class COG trained on true-error frames
(``use_true_binary_labels_train``), eval-gated by a frozen binary COG run's
per-frame predictions (``--run-id``), with ND-mask reconciliation handled by
recomputing gates on this stage's frame set."""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import ExperimentConfig
from ..data.datasets import frame_batch
from ..tracking import RunTracker
from ..train.checkpoint import load_best_checkpoint
from ..train.engine import Experiment
from .common import base_parser, config_from_args, run_frame_folds


def _gates_fn(args, cfg_seq):
    run_dir = RunTracker.find_run(args.runs_root, args.run_id)
    with open(os.path.join(run_dir, "params.json")) as f:
        params = json.load(f)
    fields = {k: v for k, v in params.items()
              if k in ExperimentConfig.__dataclass_fields__}
    cfg_bin = ExperimentConfig(**fields).replace(delete_ND=cfg_seq.delete_ND)
    exp_bin = Experiment(cfg_bin)

    def fn(out, train_trials, test_trials):
        import jax

        ckpt = load_best_checkpoint(
            os.path.join(run_dir, "checkpoints"), args.setting, out,
            model_name=cfg_bin.model_name,
        )
        b0 = frame_batch(test_trials[0], cfg_bin)
        b0 = {k: v for k, v in b0.items() if not k.startswith("_")}
        state = exp_bin.init_state(jax.random.key(0), b0)
        state = state.replace(params=ckpt["params"],
                              batch_stats=ckpt.get("batch_stats", {}),
                              constants=ckpt.get("constants",
                                                 state.constants))
        gates = {"train": {}, "test": {}}
        for trial in test_trials:
            b = frame_batch(trial, cfg_bin)
            b = {k: v for k, v in b.items() if not k.startswith("_")}
            m = exp_bin.eval_step(state, b)
            T = trial.n_frames
            gates["test"][trial.name] = np.asarray(m["preds"])[:T].astype(
                np.float32
            )
        for trial in train_trials:  # true-label gating during training
            gates["train"][trial.name] = (
                trial.labels_for("sequential") != 0
            ).astype(np.float32)
        return gates

    return fn


def main(argv=None):
    p = base_parser(__doc__)
    p.set_defaults(model_name="COG", data_type="multimodal", delete_ND=True,
                   mstcn_stages=8, lr_scheduler=False, weight_decay=0.0,
                   n_epochs=7, smooth_lambda=0.0)
    args = p.parse_args(argv)
    if not args.run_id:
        raise SystemExit("--run-id of the trained binary COG stage is required")
    cfg = config_from_args(args, error_type="sequential", dataset_type="frame",
                           out_features=5, batch_size=1)
    run_frame_folds(args, cfg, gates_fn=_gates_fn(args, cfg))


if __name__ == "__main__":
    main()
