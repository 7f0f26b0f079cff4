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
import numpy as np
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


class FoldParallelWindowRun:
    """ALL LOSO folds x ALL epochs x eval x best-checkpoint selection as ONE
    sharded program (SURVEY §2.5's marquee multi-chip configuration): the
    whole-run fusion of train/fused.py::FusedWindowRun vmapped over a
    leading fold axis that is sharded across the mesh 'data' axis — every
    chip trains its own fold end-to-end with zero collectives, and the host
    reads back stacked histories + winning checkpoints once.

    Folds differ in window counts, so every fold's arrays are padded to a
    canonical step budget (max over folds); the surplus steps are fully
    masked batches and the scan body GATES the state update on
    ``any(mask)`` — an all-masked step is an exact no-op (gradients are
    already zero through the masked mean, but Adam moments/step would still
    advance), so each fold's trajectory is identical to its own sequential
    fused run."""

    def __init__(self, exp: Experiment, cfg, folds, mesh: Optional[Mesh] = None):
        if exp.family != "window":
            raise ValueError("fold-parallel runs support the window family")
        self.exp = exp
        self.cfg = cfg
        self.mesh = mesh
        B = cfg.batch_size
        self.n_train = [len(tf) for tf, _ in folds]
        self.n_test = [len(ef) for _, ef in folds]
        self.S = max(-(-n // B) for n in self.n_train)   # canonical steps
        self.S2 = max(-(-n // B) for n in self.n_test)

        def fold_arrays(fold, nb):
            labels = fold.labels_for(cfg.error_type)
            pad = nb - len(fold)
            return {
                "images": np.pad(fold.images, ((0, pad),) + ((0, 0),) * (fold.images.ndim - 1)),
                "kinematics": np.pad(fold.kinematics, ((0, pad),) + ((0, 0),) * (fold.kinematics.ndim - 1)),
                "labels": np.pad(labels, (0, pad)),
            }

        self.tr_arrays = stack_trees(
            [fold_arrays(tf, self.S * B) for tf, _ in folds])
        self.ev_arrays = stack_trees(
            [fold_arrays(ef, self.S2 * B) for _, ef in folds])

        # fixed eval schedules per fold (FusedWindowEval's ordered batches,
        # padded to the canonical S2)
        ev_sel = np.zeros((len(folds), self.S2, B), np.int64)
        ev_mask = np.zeros((len(folds), self.S2, B), np.float32)
        for f, n in enumerate(self.n_test):
            sel = np.concatenate([np.arange(n), np.zeros(self.S2 * B - n,
                                                         np.int64)])
            m = np.concatenate([np.ones(n, np.float32),
                                np.zeros(self.S2 * B - n, np.float32)])
            ev_sel[f] = sel.reshape(self.S2, B)
            ev_mask[f] = m.reshape(self.S2, B)
        self.ev_sched = (jnp.asarray(ev_sel), jnp.asarray(ev_mask))

        binary = cfg.error_type == "global" or cfg.siamese
        self.sel_average = "weighted" if binary else "macro"
        self._fn = jax.jit(jax.vmap(self._build(),
                                    in_axes=(0, 0, 0, 0, None, 0)),
                           donate_argnums=(0,))
        if mesh is not None:
            put = lambda x: jax.device_put(x, NamedSharding(
                mesh, P("data", *([None] * (jnp.asarray(x).ndim - 1)))
                if jnp.asarray(x).shape[0] % mesh.shape["data"] == 0 else P()))
            self.tr_arrays = jax.tree.map(put, self.tr_arrays)
            self.ev_arrays = jax.tree.map(put, self.ev_arrays)
            self.ev_sched = jax.tree.map(put, self.ev_sched)

    def schedule(self, epoch: int):
        """Per-fold epoch schedules at the canonical step budget: each
        fold's own FusedWindowEpoch shuffle (seed+epoch over its REAL
        windows), then fully-masked no-op steps up to S."""
        B = self.cfg.batch_size
        sels, masks = [], []
        for n in self.n_train:
            idx = np.arange(n)
            np.random.default_rng(self.cfg.seed + epoch).shuffle(idx)
            pad = self.S * B - n
            sels.append(np.concatenate([idx, np.zeros(pad, np.int64)])
                        .reshape(self.S, B))
            masks.append(np.concatenate(
                [np.ones(n, np.float32), np.zeros(pad, np.float32)])
                .reshape(self.S, B))
        return np.stack(sels), np.stack(masks)

    def _build(self):
        from ..ops.metrics import f1_from_cm_device
        from ..train.optim import set_lr

        tstep = self.exp._make_step(train=True)
        estep = self.exp._make_step(train=False)
        use_loss = self.cfg.loss_or_f1 == "loss"
        avg = self.sel_average

        def run(state, tr_arrays, ev_arrays, sched, lrs, ev_sched):
            def epoch_body(carry, xs):
                state, best_score, best_ckpt = carry
                (sel_e, mask_e), lr_e = xs
                state = state.replace(opt_state=set_lr(state.opt_state, lr_e))

                def tbody(c, xs2):
                    s, m = xs2
                    batch = {**{k: v[s] for k, v in tr_arrays.items()},
                             "mask": m}
                    ns, met = tstep(c, batch)
                    # all-masked surplus step -> exact no-op (gradients are
                    # zero but Adam moments/step would still advance)
                    ns = jax.lax.cond(jnp.any(m > 0),
                                      lambda a, _: a, lambda _, b: b, ns, c)
                    return ns, (met["cm"], met["loss"])

                state, (tcms, tlosses) = jax.lax.scan(
                    tbody, state, (sel_e, mask_e))

                def ebody(c, xs2):
                    s, m = xs2
                    batch = {**{k: v[s] for k, v in ev_arrays.items()},
                             "mask": m}
                    met = estep(c, batch)
                    return c, (met["preds"], met["probs"], met["cm"],
                               met["loss"])

                _, (preds, probs, ecms, elosses) = jax.lax.scan(
                    ebody, state, ev_sched)

                ev_valid = (jnp.sum(ev_sched[1], axis=1) > 0).astype(
                    elosses.dtype)
                score = (
                    jnp.sum(elosses * ev_valid) / jnp.sum(ev_valid)
                    if use_loss
                    else f1_from_cm_device(jnp.sum(ecms, axis=0), avg)
                )
                better = ((score < best_score) if use_loss
                          else (score > best_score))
                ckpt = {"params": state.params,
                        "batch_stats": state.batch_stats,
                        "constants": state.constants}
                best_ckpt = jax.tree.map(
                    lambda n_, o: jnp.where(better, n_, o), ckpt, best_ckpt)
                best_score = jnp.where(better, score, best_score)
                return (state, best_score, best_ckpt), (
                    tcms, tlosses, preds, probs, ecms, elosses, score)

            init = jnp.asarray(np.inf if use_loss else -np.inf, jnp.float32)
            ckpt0 = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "constants": state.constants}
            (state, _, bckpt), outs = jax.lax.scan(
                epoch_body, (state, init, ckpt0), (sched, lrs))
            return state, bckpt, outs

        return run

    def run(self, states, first_epoch: int, n_epochs: int):
        """``states``: stacked per-fold TrainStates (init_states-style).
        Returns (stacked final states, stacked best ckpts, stacked outs with
        a leading fold axis on every element)."""
        from ..train.optim import epoch_lr

        epochs = range(first_epoch, first_epoch + n_epochs)
        scheds = [self.schedule(e) for e in epochs]
        sel = jnp.asarray(np.stack([s for s, _ in scheds], axis=1))
        mask = jnp.asarray(np.stack([m for _, m in scheds], axis=1))
        if self.mesh is not None:
            spec = lambda x: NamedSharding(
                self.mesh, P("data", *([None] * (x.ndim - 1)))
                if x.shape[0] % self.mesh.shape["data"] == 0 else P())
            sel = jax.device_put(sel, spec(sel))
            mask = jax.device_put(mask, spec(mask))
        lrs = jnp.asarray([epoch_lr(self.cfg, e) for e in epochs], np.float32)
        return self._fn(states, self.tr_arrays, self.ev_arrays, (sel, mask),
                        lrs, self.ev_sched)
