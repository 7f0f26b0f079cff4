"""Fused on-device training epochs for the window families.

The window dataset is small enough to live in HBM (a 5 Hz fold is ~1-2 GB of
windows), so an entire epoch compiles to ONE program: a ``lax.scan`` over the
batch schedule that gathers each batch from the device-resident fold arrays,
runs the train step, and stacks the per-batch confusion matrices in the
carry. The host only ships the (steps, batch) index/mask schedule per epoch
(a few KB) and reads back the stacked metrics once.

This removes every per-batch dispatch: on the axon relay a dispatch costs
milliseconds — more than the 512-window step itself — so fused epochs run
an order of magnitude faster than the per-batch loop while producing
*exactly* the same numbers (same batch order, same dropout rng stream; see
tests/test_fused_epoch.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data.datasets import WindowFold
from .engine import Experiment, TrainState


class FusedWindowEpoch:
    def __init__(
        self,
        exp: Experiment,
        cfg: ExperimentConfig,
        fold: WindowFold,
        extras: Optional[Dict[str, np.ndarray]] = None,
    ):
        if exp.family != "window":
            raise ValueError("fused epochs support the plain window family")
        self.cfg = cfg
        self.exp = exp
        labels = fold.labels_for(cfg.error_type)
        self.n = len(fold)
        self.arrays = {
            "images": jnp.asarray(fold.images),
            "kinematics": jnp.asarray(fold.kinematics),
            "labels": jnp.asarray(labels),
        }
        for k, v in (extras or {}).items():
            self.arrays[k] = jnp.asarray(v)
        self._epoch_fn = jax.jit(self._build(), donate_argnums=(0,))

    def _build(self):
        step = self.exp._make_step(train=True)

        # the fold arrays are jit ARGUMENTS, not closure constants — closing
        # over them would embed the whole fold in the compiled program (and
        # blow up the remote-compile request)
        def epoch(state: TrainState, arrays, idx, mask):
            def body(carry, xs):
                sel, m = xs
                batch = {k: v[sel] for k, v in arrays.items()}
                batch["mask"] = m
                new_state, metrics = step(carry, batch)
                return new_state, (metrics["cm"], metrics["loss"])

            state, (cms, losses) = jax.lax.scan(body, state, (idx, mask))
            return state, cms, losses

        return epoch

    def schedule(self, epoch: int) -> Tuple[np.ndarray, np.ndarray]:
        """Same deterministic shuffle + padding as ``window_batches``."""
        B = self.cfg.batch_size
        idx = np.arange(self.n)
        np.random.default_rng(self.cfg.seed + epoch).shuffle(idx)
        steps = -(-self.n // B)
        pad = steps * B - self.n
        sel = np.concatenate([idx, np.zeros(pad, np.int64)]).reshape(steps, B)
        mask = np.concatenate(
            [np.ones(self.n, np.float32), np.zeros(pad, np.float32)]
        ).reshape(steps, B)
        return sel, mask

    def run_epoch(self, state: TrainState, epoch: int):
        """Returns (state, per-batch CMs (S, C, C), per-batch losses (S,))."""
        sel, mask = self.schedule(epoch)
        return self._epoch_fn(state, self.arrays, jnp.asarray(sel),
                              jnp.asarray(mask))


class FusedWindowEval:
    """Whole eval pass as one program: scan over ordered batches returning
    stacked (preds, probs, CMs, losses); the host concatenates and trims the
    padding tail. Identical numbers to the per-batch eval loop."""

    def __init__(
        self,
        exp: Experiment,
        cfg: ExperimentConfig,
        fold: WindowFold,
        extras: Optional[Dict[str, np.ndarray]] = None,
    ):
        if exp.family != "window":
            raise ValueError("fused eval supports the plain window family")
        self.cfg = cfg
        self.exp = exp
        labels = fold.labels_for(cfg.error_type)
        self.n = len(fold)
        self.arrays = {
            "images": jnp.asarray(fold.images),
            "kinematics": jnp.asarray(fold.kinematics),
            "labels": jnp.asarray(labels),
        }
        for k, v in (extras or {}).items():
            self.arrays[k] = jnp.asarray(v)
        B = cfg.batch_size
        steps = -(-self.n // B)
        pad = steps * B - self.n
        sel = np.concatenate([np.arange(self.n), np.zeros(pad, np.int64)])
        mask = np.concatenate(
            [np.ones(self.n, np.float32), np.zeros(pad, np.float32)]
        )
        self._sel = jnp.asarray(sel.reshape(steps, B))
        self._mask = jnp.asarray(mask.reshape(steps, B))
        self._fn = jax.jit(self._build())

    def _build(self):
        step = self.exp._make_step(train=False)

        def run(state: TrainState, arrays, idx, mask):
            def body(carry, xs):
                sel, m = xs
                batch = {k: v[sel] for k, v in arrays.items()}
                batch["mask"] = m
                metrics = step(carry, batch)
                return carry, (metrics["preds"], metrics["probs"],
                               metrics["cm"], metrics["loss"])

            _, outs = jax.lax.scan(body, state, (idx, mask))
            return outs

        return run

    def run(self, state: TrainState):
        preds, probs, cms, losses = self._fn(state, self.arrays, self._sel,
                                             self._mask)
        preds = np.asarray(preds).reshape(-1)[: self.n]
        probs = np.asarray(probs).reshape(
            (self._sel.size,) + tuple(probs.shape[2:])
        )[: self.n]
        return preds, probs, np.asarray(cms), np.asarray(losses)
