"""6-class (error-specific) window training (reference train_window_ES.ipynb):
powerset classes {NoErr, OOV, MA, NP, OOV+MA, MA+NP}, Needle-Drop windows
dropped, CE with optional reciprocal-frequency class weights."""

from __future__ import annotations

from .common import base_parser, config_from_args, run_window_folds


def main(argv=None):
    p = base_parser(__doc__)
    p.set_defaults(model_name="SimpleLSTM", delete_ND=True)
    args = p.parse_args(argv)
    cfg = config_from_args(args, error_type="all_errors",
                           dataset_type="window", out_features=6)
    run_window_folds(args, cfg)


if __name__ == "__main__":
    main()
