"""Device compute ops: XLA primitives + Pallas kernels.

- :mod:`interpolate` — 1-D nearest/linear resampling (torch `F.interpolate`
  semantics) for the COG FPN and multi-resolution loss fusion.
- :mod:`attention`   — sliding-window local attention (the COG/TransSVNet
  pattern) as a gather-free Pallas kernel with a pure-XLA fallback.
- :mod:`metrics`     — on-device streaming confusion matrices (replaces the
  reference's per-batch sklearn host syncs).
"""

from .interpolate import interp1d_linear, interp1d_nearest  # noqa: F401
from .attention import (  # noqa: F401
    layer_norm,
    multi_head_attention,
    sliding_windows,
    sliding_window_attention,
)
from .metrics import confusion_matrix, metrics_from_cm  # noqa: F401
