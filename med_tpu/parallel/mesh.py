"""Mesh construction and sharding rules.

Axes:
- ``data``  — batch dimension (windows / trials); pure DP, gradients are
  all-reduced by XLA (psum over ICI).
- ``model`` — tensor parallelism for the widest matmuls (the 2048->512->256
  FeatureExtractor): its first kernel is sharded column-wise and the second
  row-wise (megatron layout), so XLA needs one reduce between them.

Sharding is expressed purely as `NamedSharding` placement on the state/batch
arrays; the jitted train step is unchanged — jax.jit (pjit) partitions the
computation and inserts the ICI collectives. Optimizer moments mirror the
param tree, so placements are assigned *by array shape*, which covers params
and Adam moments uniformly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# FeatureExtractor matmul shapes -> tensor-parallel specs (megatron layout)
_TP_SPECS = {
    (2048, 512): P(None, "model"),  # column-parallel
    (512,): P("model"),
    (512, 256): P("model", None),   # row-parallel
}


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // model, model)
    dev_mesh = mesh_utils.create_device_mesh(shape, devices=np.asarray(devices))
    return Mesh(dev_mesh, axis_names[: len(shape)])


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every batch array along its leading (example) axis."""
    n_data = mesh.shape["data"]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data != 0 or x.shape[0] < n_data:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )

    return {k: put(v) for k, v in batch.items()}


def shard_params(params, mesh: Mesh):
    """Place FE kernels tensor-parallel over 'model' (by shape), replicate
    the rest. Applies to any param-shaped tree (params, grads, moments)."""
    tp = "model" in mesh.shape and mesh.shape["model"] > 1

    def put(x):
        x = jnp.asarray(x)
        spec = _TP_SPECS.get(tuple(x.shape), P()) if tp else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: every array placed by the shape rules (params and
    Adam moments get TP placement; scalars and everything else replicated)."""
    return jax.tree.map(lambda x: _put_by_shape(x, mesh), state)


def _put_by_shape(x, mesh: Mesh):
    x = jnp.asarray(x)
    tp = "model" in mesh.shape and mesh.shape["model"] > 1
    spec = _TP_SPECS.get(tuple(x.shape), P()) if tp else P()
    return jax.device_put(x, NamedSharding(mesh, spec))
