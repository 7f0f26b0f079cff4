"""Plotting utilities (reference MED/visualization/utils.py)."""

from .utils import plot_cm, plot_results_LOSO  # noqa: F401
