"""Host-side data pipeline: offline preprocessing, fold loading, windowing,
label powerset, and array-based datasets (reference ``MED/dataset/``)."""

from .labels import powerset_error_labels, select_error_labels  # noqa: F401
from .windowing import window_data, window_scan, compute_window_size_stride  # noqa: F401
