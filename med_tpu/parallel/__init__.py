"""Parallelism layer: device meshes, sharding rules, fold parallelism.

The reference is strictly single-device (SURVEY.md §2.5: no DDP/TP/PP, no
collectives of any kind), so this layer is new TPU-native capability, not a
port: batch data-parallelism and feature-extractor tensor-parallelism over a
``jax.sharding.Mesh`` (XLA inserts the ICI collectives), plus embarrassingly
parallel LOSO-fold training via stacked-parameter vmap.
"""

from .mesh import make_mesh, shard_batch, shard_params, shard_state  # noqa: F401
