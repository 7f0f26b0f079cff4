"""Checkpoint I/O.

The reference saves ``{'feature_extractor': sd, 'model': sd}`` torch
state-dicts per fold (modeling_utils.py:3028-3040). Here the param /
batch-stat / constant pytrees are flattened to a single ``.npz`` with
'/'-joined key paths plus a JSON manifest — dependency-light, memory-mappable
and framework-stable. (Orbax remains available for sharded multi-host
checkpoints; this format covers the single-file best-model use.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any = None,
    constants: Any = None,
    meta: Optional[Dict] = None,
) -> None:
    tree: Dict[str, Any] = {"params": params}
    if batch_stats:
        tree["batch_stats"] = batch_stats
    if constants:
        tree["constants"] = constants
    flat = flatten_dict(tree, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1)


def load_checkpoint(path: str, model_name: Optional[str] = None) -> Dict[str, Any]:
    """Load a checkpoint tree. A reference torch ``best_model_*.pt`` blob
    (modeling_utils.py:3028-3040) is transparently imported via
    :mod:`med_tpu.utils.torch_port` — ``model_name`` is required then, so the
    state_dict key layout can be mapped."""
    if path.endswith(".pt"):
        if model_name is None:
            raise ValueError(
                "model_name is required to import a reference .pt checkpoint"
            )
        from ..utils.torch_port import import_reference_checkpoint

        return import_reference_checkpoint(path, model_name)
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_dict(flat, sep="/")


def load_best_checkpoint(
    ckpt_dir: str, setting: str, out: str, model_name: Optional[str] = None
) -> Dict[str, Any]:
    """Load ``best_model_{setting}_{out}`` from a run's checkpoint dir,
    preferring our ``.npz`` format and falling back to a reference torch
    ``.pt`` blob with the same stem (the reference's save naming,
    modeling_utils.py:3028-3040) — so recorded reference runs can be served,
    ensembled, or used as a frozen TSVN stage directly."""
    base = os.path.join(ckpt_dir, f"best_model_{setting}_{out}")
    if os.path.exists(base + ".npz"):
        return load_checkpoint(base + ".npz")
    if os.path.exists(base + ".pt"):
        return load_checkpoint(base + ".pt", model_name=model_name)
    raise FileNotFoundError(base + ".{npz,pt}")


# ----------------------------------------------------------------- resume
def save_train_state(path: str, state, epoch: int) -> None:
    """Full mid-training snapshot (params + optimizer moments + batch stats
    + rng + step), enabling exact resume. The reference has no resume at all
    (SURVEY.md §5: best-model-per-fold checkpointing only)."""
    import jax

    raw = state.replace(rng=jax.random.key_data(state.rng))
    leaves = jax.tree.leaves(raw)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["epoch"] = np.asarray(epoch)
    np.savez(path, **arrays)


def load_train_state(path: str, template_state):
    """Restore a snapshot into the structure of ``template_state`` (obtained
    from ``Experiment.init_state`` with the same config). Returns
    (state, next_epoch)."""
    import jax

    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    raw_template = template_state.replace(
        rng=jax.random.key_data(template_state.rng)
    )
    treedef = jax.tree.structure(raw_template)
    with np.load(path) as z:
        epoch = int(z["epoch"])
        leaves = [z[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    raw = jax.tree.unflatten(treedef, leaves)
    state = raw.replace(rng=jax.random.wrap_key_data(raw.rng))
    return state, epoch + 1


# ------------------------------------------------------------------ orbax
def save_train_state_orbax(directory: str, state, epoch: int) -> None:
    """Orbax-backed full snapshot (SURVEY.md §5's named TPU equivalent):
    the same raw TrainState tree as :func:`save_train_state`, written as a
    sharding-aware Orbax checkpoint directory — for multi-host / sharded
    states where per-shard parallel IO matters. The ``.npz`` format stays
    the default (single-file, dependency-light)."""
    import jax
    import orbax.checkpoint as ocp

    raw = state.replace(rng=jax.random.key_data(state.rng))
    # Hand Orbax the jax arrays WITH their shardings — gathering to host
    # numpy first would serialize the save through one host and break on
    # non-fully-addressable arrays, defeating per-shard parallel IO.
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(os.path.abspath(directory), f"epoch_{epoch}"),
            {"state": raw, "epoch": epoch},
        )


def load_train_state_orbax(directory: str, template_state):
    """Restore the latest Orbax snapshot under ``directory`` into the
    structure of ``template_state``. Returns (state, next_epoch)."""
    import re as _re

    import jax
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    epochs = sorted(
        int(m.group(1))
        for d in os.listdir(directory)
        if (m := _re.fullmatch(r"epoch_(\d+)", d))
    )
    if not epochs:
        raise FileNotFoundError(f"no epoch_* checkpoints under {directory}")
    raw_template = template_state.replace(
        rng=jax.random.key_data(template_state.rng)
    )
    # the template's jax arrays carry shapes/dtypes/shardings: restore lands
    # each shard directly on its devices
    target = {"state": raw_template, "epoch": epochs[-1]}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(directory, f"epoch_{epochs[-1]}"), target
        )
    raw = jax.tree.unflatten(
        jax.tree.structure(raw_template), jax.tree.leaves(restored["state"])
    )
    state = raw.replace(rng=jax.random.wrap_key_data(raw.rng))
    return state, int(restored["epoch"]) + 1
