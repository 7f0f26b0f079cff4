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

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_keys(path) -> list:
    """Tree-path entries -> plain string key names (DictKey / GetAttrKey;
    positional keys like optax NamedTuple indices are skipped)."""
    out = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if isinstance(name, str):
            out.append(name)
    return out


def _tp_spec_for(path, shape, n_model: int) -> P:
    """Megatron placement for the FeatureExtractor MLP, matched by tree PATH
    (works for any ``video_dims`` / FE width, and covers params and Adam
    moments uniformly since optax per-leaf states mirror the param dict):

    - ``fe/dense0/kernel`` (2048, h0): column-parallel  P(None, 'model')
    - ``fe/dense0/bias``   (h0,):      follows the columns  P('model')
    - ``fe/dense1/kernel`` (h0, h1):   row-parallel  P('model', None)
      (XLA inserts the one reduce between the two matmuls)
    - everything else replicated.

    A dimension that does not divide the 'model' axis degrades to
    replication with a warning instead of silently (the old table simply
    missed non-default shapes)."""
    keys = _path_keys(path)
    if "fe" not in keys:
        return P()
    rest = keys[keys.index("fe") + 1:]
    if "dense0" in rest:
        dim = shape[-1] if rest and rest[-1] == "kernel" else shape[0]
        if dim % n_model:
            warnings.warn(
                f"fe/dense0 width {dim} not divisible by model axis "
                f"{n_model}; replicating", stacklevel=2)
            return P()
        return P(None, "model") if rest[-1] == "kernel" else P("model")
    if "dense1" in rest and rest and rest[-1] == "kernel":
        if shape[0] % n_model:
            warnings.warn(
                f"fe/dense1 in-dim {shape[0]} not divisible by model axis "
                f"{n_model}; replicating", stacklevel=2)
            return P()
        return P("model", None)
    return P()


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
    """Shard every batch array along its leading (example) axis. A leading
    axis that does not divide the 'data' axis degrades to replication WITH A
    WARNING (DP silently becoming replication was easy to miss; size your
    batch a multiple of the data axis — the fixed-shape padded batches
    normally guarantee this)."""
    n_data = mesh.shape["data"]

    def put(name, x):
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] < n_data:
            return jax.device_put(x, NamedSharding(mesh, P()))
        if x.shape[0] % n_data != 0:
            warnings.warn(
                f"batch['{name}'] leading dim {x.shape[0]} not divisible by "
                f"data axis {n_data}; replicating (DP disabled for this "
                f"array)", stacklevel=2)
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )

    return {k: put(k, v) for k, v in batch.items()}


def shard_params(params, mesh: Mesh):
    """Place FE kernels tensor-parallel over 'model' (by tree path),
    replicate the rest. Applies to any param-shaped tree (params, grads,
    moments)."""
    return shard_state(params, mesh)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState (or any param-shaped tree): every array placed by
    the path rules (FE params and their Adam moments get TP placement;
    scalars and everything else replicated)."""
    tp = "model" in mesh.shape and mesh.shape["model"] > 1
    n_model = mesh.shape.get("model", 1)

    def put(path, x):
        x = jnp.asarray(x)
        spec = _tp_spec_for(path, x.shape, n_model) if tp else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)
