"""Fold-parallel training: the 5 LOSO folds trained simultaneously.

LOSO cross-validation is embarrassingly parallel — the reference trains the
folds sequentially on one device (train_window.ipynb cell 2 fold loop). Here
all fold states are stacked on a leading fold axis, the per-family train
step is vmapped over it, and the fold axis is sharded over the mesh's
'data' axis, so each chip trains its own fold with zero collectives —
near-linear LOSO speedup on a pod slice.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.engine import Experiment, TrainState


def stack_trees(trees: List):
    """Stack identical pytrees along a new leading fold axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


def unstack_tree(tree, index: int):
    return jax.tree.map(lambda x: x[index], tree)


class FoldParallel:
    """vmap-over-folds wrapper around an Experiment's train/eval steps."""

    def __init__(self, exp: Experiment, mesh: Optional[Mesh] = None):
        self.exp = exp
        self.mesh = mesh
        self._train = jax.jit(jax.vmap(exp._make_step(train=True)),
                              donate_argnums=(0,))
        self._eval = jax.jit(jax.vmap(exp._make_step(train=False)))

    def init_states(self, rngs, sample_batches, **kw) -> TrainState:
        states = [
            self.exp.init_state(rng, batch, **kw)
            for rng, batch in zip(rngs, sample_batches)
        ]
        stacked = stack_trees(states)
        if self.mesh is not None:
            spec = NamedSharding(self.mesh, P("data"))

            def shard(x):
                if x.ndim >= 1 and x.shape[0] % self.mesh.shape["data"] == 0:
                    return jax.device_put(x, NamedSharding(
                        self.mesh, P("data", *([None] * (x.ndim - 1)))))
                return jax.device_put(x, NamedSharding(self.mesh, P()))

            stacked = jax.tree.map(shard, stacked)
        return stacked

    def shard_batches(self, batches: List[dict]) -> dict:
        stacked = stack_trees([
            {k: v for k, v in b.items() if not k.startswith("_")}
            for b in batches
        ])
        if self.mesh is not None:
            stacked = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(self.mesh,
                                     P("data", *([None] * (x.ndim - 1))))
                ),
                stacked,
            )
        return stacked

    def train_step(self, states, batches):
        return self._train(states, batches)

    def eval_step(self, states, batches):
        return self._eval(states, batches)
