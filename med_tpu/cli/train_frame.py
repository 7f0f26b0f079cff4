"""Binary frame-level training (reference train_frame.ipynb): TeCNo,
TransSVNet (refining a frozen TeCNo loaded from ``--run-id``), or COG over
whole trials (batch = 1), plus the frame->window metric rollup."""

from __future__ import annotations

import os

from ..tracking import RunTracker
from ..train.checkpoint import load_best_checkpoint
from .common import base_parser, config_from_args, run_frame_folds


def _frozen_fn(args):
    run_dir = RunTracker.find_run(args.runs_root, args.run_id)

    def fn(out):
        ckpt = load_best_checkpoint(
            os.path.join(run_dir, "checkpoints"), args.setting, out,
            model_name="TeCNo",
        )
        return {"tecno_params": ckpt["params"]["model"]}

    return fn


def main(argv=None):
    p = base_parser(__doc__)
    p.set_defaults(model_name="TeCNo", data_type="video", video_dims=2048,
                   lr_scheduler=False, weight_decay=0.0, n_epochs=7)
    args = p.parse_args(argv)
    cfg = config_from_args(args, error_type="global", dataset_type="frame",
                           out_features=2, batch_size=1)
    frozen_fn = None
    if cfg.model_name == "TransSVNet":
        if not args.run_id:
            raise SystemExit("TransSVNet needs --run-id of a trained TeCNo run")
        frozen_fn = _frozen_fn(args)
    run_frame_folds(args, cfg, frozen_fn=frozen_fn)


if __name__ == "__main__":
    main()
