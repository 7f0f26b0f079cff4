"""Parallelism layer: device meshes, sharding rules, fold / sequence /
pipeline parallelism.

The reference is strictly single-device (SURVEY.md §2.5: no DDP/TP/PP, no
collectives of any kind), so this layer is new TPU-native capability, not a
port: batch data-parallelism and feature-extractor tensor-parallelism over a
``jax.sharding.Mesh`` (XLA inserts the ICI collectives), embarrassingly
parallel LOSO-fold training via stacked-parameter vmap (:mod:`.folds`),
sequence parallelism for the frame families (:mod:`.seqpar` /
:mod:`.sp_cog` / :mod:`.sp_tsvn`, full training mode in :mod:`.sp_train`),
and pipeline parallelism over TCN refinement stages (:mod:`.pipeline`).
Every tier is reachable from the CLI drivers (``--mesh``,
``--fold-parallel``, ``--trial-dp``, ``--sequence-parallel``).
"""

from .mesh import make_mesh, shard_batch, shard_params, shard_state  # noqa: F401
