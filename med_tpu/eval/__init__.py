"""Result aggregation: frame->window rollup, LOSO summary tables, ensembles
(reference modeling_utils.py:2377-3025 + ensemble.ipynb)."""

from .summary import create_summary, weighted_mean_std  # noqa: F401
from .rollup import compute_window_metrics, frame_to_window  # noqa: F401
from .ensemble import cascade_ensemble, soft_vote  # noqa: F401
