"""med_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multimodal surgical
error-detection framework.

This is a from-scratch, TPU-first re-design of the capabilities of the
reference repo GonzaloPlaaza/Multimodal-Error-Detection (a PyTorch/MPS
notebook codebase; see /root/repo/SURVEY.md for the full structural map).
Nothing here is a port: the compute path is JAX/XLA with Pallas kernels for
the hot ops, parallelism is expressed with `jax.sharding` over device meshes,
and the host-side runtime (windowing scans, siamese pair generation, frame
preprocessing) has native C++ implementations with NumPy fallbacks.

Layout
------
- :mod:`med_tpu.config`    — typed experiment configuration (replaces the
  reference's untyped ``exp_kwargs`` dict, train_window.ipynb cell 1).
- :mod:`med_tpu.data`      — offline preprocessing + fold loading + windowing
  + label powerset + datasets (reference ``MED/dataset/``).
- :mod:`med_tpu.models`    — the seven model families as Flax modules
  (reference ``MED/modeling/models*.py``).
- :mod:`med_tpu.ops`       — XLA/Pallas kernels: sliding local attention,
  causal dilated conv, on-device confusion-matrix metrics, interpolation.
- :mod:`med_tpu.train`     — jitted train/eval steps, optimizer, epoch loops,
  checkpointing (reference ``MED/modeling/modeling_utils.py``).
- :mod:`med_tpu.eval`      — frame→window rollup, summary tables, ensembles.
- :mod:`med_tpu.parallel`  — mesh construction, batch/fold sharding, and
  collective helpers (new: the reference is single-device, SURVEY.md §2.5).
- :mod:`med_tpu.tracking`  — file-based run tracking (replaces MLflow).
- :mod:`med_tpu.cli`       — CLI drivers replacing the training notebooks.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
