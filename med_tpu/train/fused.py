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


class FusedFrameEpoch:
    """One jitted program per frame-family epoch (TeCNo / TransSVNet / COG).

    The per-trial loop pays one relay dispatch (~80 ms here) per trial
    group (reference train_frame.ipynb cell 2 epoch loop); instead every
    trial of the fold is padded to ONE common bucket, stacked into
    HBM-resident arrays, and the epoch compiles to a ``lax.scan`` over the
    shuffled trial (or trial-group) schedule. Bit-exact vs the per-trial
    loop: same shuffle (seed+epoch), same rng stream, same masked losses
    (tests/test_fused_epoch.py::test_fused_frame_*).

    ``batches``: one ``frame_batch`` dict per train trial, all with
    identical shapes (common bucket), including any gate / tecno_logits
    extras. Arrays are jit ARGS, not closure constants (413-limit rule).
    """

    def __init__(self, exp: Experiment, cfg: ExperimentConfig, batches):
        self.cfg = cfg
        self.exp = exp
        self.G = max(1, cfg.trial_batch)
        self.n = len(batches)
        keys = [k for k in batches[0]
                if not k.startswith("_") and k != "trial_weight"]
        self.arrays = {
            k: jnp.asarray(np.stack([np.asarray(b[k]) for b in batches]))
            for k in keys
        }
        self._epoch_fn = jax.jit(self._build(), donate_argnums=(0,))

    def _build(self):
        step = self.exp._make_step(train=True)
        if self.G > 1:

            def epoch(state: TrainState, arrays, sel, weight):
                def body(carry, xs):
                    s, w = xs
                    batch = {k: v[s] for k, v in arrays.items()}
                    batch["trial_weight"] = w
                    new_state, m = step(carry, batch)
                    return new_state, (m["cm"], m["loss"])

                state, (cms, losses) = jax.lax.scan(body, state, (sel, weight))
                return state, cms, losses

            return epoch

        def epoch(state: TrainState, arrays, sel, weight):
            def body(carry, s):
                batch = {k: v[s] for k, v in arrays.items()}
                new_state, m = step(carry, batch)
                return new_state, (m["cm"], m["loss"])

            state, (cms, losses) = jax.lax.scan(body, state, sel)
            return state, cms, losses

        return epoch

    def schedule(self, epoch: int) -> Tuple[np.ndarray, np.ndarray]:
        """Same shuffle + group padding as the per-trial loop
        (loop.py::train_frame_fold: short groups repeat the group's first
        trial with weight 0)."""
        order = np.random.default_rng(self.cfg.seed + epoch).permutation(self.n)
        if self.G == 1:
            return order, np.ones(self.n, np.float32)
        G = self.G
        steps = -(-self.n // G)
        sel = np.empty((steps, G), np.int64)
        weight = np.zeros((steps, G), np.float32)
        for r, s in enumerate(range(0, self.n, G)):
            group = order[s : s + G]
            sel[r, : len(group)] = group
            sel[r, len(group) :] = group[0]
            weight[r, : len(group)] = 1.0
        return sel, weight

    def run_epoch(self, state: TrainState, epoch: int):
        sel, weight = self.schedule(epoch)
        return self._epoch_fn(state, self.arrays, jnp.asarray(sel),
                              jnp.asarray(weight))


class FusedFrameEval:
    """Whole frame-family eval pass as one program: scan over test trials
    (or trial groups) returning stacked (preds, probs, CMs, losses); the
    host trims each trial to its true length."""

    def __init__(self, exp: Experiment, cfg: ExperimentConfig, batches):
        self.cfg = cfg
        self.exp = exp
        self.G = max(1, cfg.trial_batch)
        self.n = len(batches)
        keys = [k for k in batches[0]
                if not k.startswith("_") and k != "trial_weight"]
        self.arrays = {
            k: jnp.asarray(np.stack([np.asarray(b[k]) for b in batches]))
            for k in keys
        }
        if self.G == 1:
            self._sel = jnp.arange(self.n)
            self._weight = jnp.ones(self.n, jnp.float32)
        else:
            G = self.G
            steps = -(-self.n // G)
            sel = np.empty((steps, G), np.int64)
            weight = np.zeros((steps, G), np.float32)
            for r, s in enumerate(range(0, self.n, G)):
                group = np.arange(s, min(s + G, self.n))
                sel[r, : len(group)] = group
                sel[r, len(group) :] = group[0]
                weight[r, : len(group)] = 1.0
            self._sel = jnp.asarray(sel)
            self._weight = jnp.asarray(weight)
        self._fn = jax.jit(self._build())

    def _build(self):
        step = self.exp._make_step(train=False)
        if self.G > 1:

            def run(state: TrainState, arrays, sel, weight):
                def body(carry, xs):
                    s, w = xs
                    batch = {k: v[s] for k, v in arrays.items()}
                    batch["trial_weight"] = w
                    m = step(carry, batch)
                    return carry, (m["preds"], m["probs"], m["cm"], m["loss"])

                _, outs = jax.lax.scan(body, state, (sel, weight))
                return outs

            return run

        def run(state: TrainState, arrays, sel, weight):
            def body(carry, s):
                batch = {k: v[s] for k, v in arrays.items()}
                m = step(carry, batch)
                return carry, (m["preds"], m["probs"], m["cm"], m["loss"])

            _, outs = jax.lax.scan(body, state, sel)
            return outs

        return run

    def run(self, state: TrainState):
        """(preds, probs, cms, losses): preds/probs indexed [trial] on the
        leading axis (groups flattened), padded to the common bucket."""
        preds, probs, cms, losses = self._fn(state, self.arrays, self._sel,
                                             self._weight)
        preds = np.asarray(preds)
        probs = np.asarray(probs)
        if self.G > 1:  # (steps, G, T…) -> (steps*G, T…)
            preds = preds.reshape((-1,) + preds.shape[2:])
            probs = probs.reshape((-1,) + probs.shape[2:])
        return preds[: self.n], probs[: self.n], np.asarray(cms), np.asarray(losses)


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
