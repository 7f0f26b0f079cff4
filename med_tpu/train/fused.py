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
        fold: Optional[WindowFold] = None,
        extras: Optional[Dict[str, np.ndarray]] = None,
        arrays: Optional[Dict[str, np.ndarray]] = None,
        bucket: Optional[int] = None,
    ):
        """``fold``: the window-family path. ``arrays``: any indexable
        {images, kinematics, labels} dict instead — used for the siamese
        pair arrays (images (P, 2, W, F)), whose batch protocol is
        identical (loop.py::_siamese_batches).

        ``bucket``: pad the window axis up to this count (zeros, never
        selected by the schedule; surplus steps are fully masked) so folds
        of similar size share ONE compiled program — the cold XLA compile
        on the relay costs minutes per distinct shape."""
        if exp.family not in ("window", "siamese"):
            raise ValueError("fused epochs support the window families")
        self.cfg = cfg
        self.exp = exp
        if arrays is not None:
            self.arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            self.n = len(next(iter(self.arrays.values())))
        else:
            labels = fold.labels_for(cfg.error_type)
            self.n = len(fold)
            self.arrays = {
                "images": jnp.asarray(fold.images),
                "kinematics": jnp.asarray(fold.kinematics),
                "labels": jnp.asarray(labels),
            }
        for k, v in (extras or {}).items():
            self.arrays[k] = jnp.asarray(v)
        self.n_padded = max(bucket or 0, self.n)
        if self.n_padded > self.n:
            pad = self.n_padded - self.n
            self.arrays = {
                k: jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
                for k, v in self.arrays.items()
            }
        self.steps_real = -(-self.n // cfg.batch_size)
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
        """Same deterministic shuffle + padding as ``window_batches``; the
        shuffle covers only the REAL windows, surplus bucket steps are
        fully masked (and no-op-gated by the whole-run scan body)."""
        B = self.cfg.batch_size
        idx = np.arange(self.n)
        np.random.default_rng(self.cfg.seed + epoch).shuffle(idx)
        steps = -(-self.n_padded // B)
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
        fold: Optional[WindowFold] = None,
        extras: Optional[Dict[str, np.ndarray]] = None,
        arrays: Optional[Dict[str, np.ndarray]] = None,
        bucket: Optional[int] = None,
    ):
        if exp.family not in ("window", "siamese"):
            raise ValueError("fused eval supports the window families")
        self.cfg = cfg
        self.exp = exp
        if arrays is not None:
            self.arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            self.n = len(next(iter(self.arrays.values())))
        else:
            labels = fold.labels_for(cfg.error_type)
            self.n = len(fold)
            self.arrays = {
                "images": jnp.asarray(fold.images),
                "kinematics": jnp.asarray(fold.kinematics),
                "labels": jnp.asarray(labels),
            }
        for k, v in (extras or {}).items():
            self.arrays[k] = jnp.asarray(v)
        n_padded = max(bucket or 0, self.n)
        if n_padded > self.n:
            padn = n_padded - self.n
            self.arrays = {
                k: jnp.pad(v, ((0, padn),) + ((0, 0),) * (v.ndim - 1))
                for k, v in self.arrays.items()
            }
        B = cfg.batch_size
        steps = -(-n_padded // B)
        self.steps_real = -(-self.n // B)
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


class _FusedRunBase:
    """Shared scaffolding for whole-run fusion: ONE device program scanning
    over epochs of {cosine LR update -> train-epoch scan -> eval scan ->
    on-device best-checkpoint selection}. The host ships the per-epoch
    schedules + LR table once and reads back stacked metrics, predictions
    and the winning checkpoint; per-epoch dispatches disappear entirely
    (the relay here costs ~90 ms per dispatch against ~3-5 ms of epoch
    compute).

    Selection replicates loop.py::_better: lowest mean eval loss when
    ``cfg.loss_or_f1 == 'loss'``, else highest pooled-CM F1
    (``self.sel_average``), strict improvement only. The per-epoch scores
    are returned so the host's bookkeeping replays the exact device
    comparison. Deviation from the per-epoch loop: the NaN watchdog cannot
    halt mid-run — non-finite epochs simply can never win selection (NaN
    comparisons are False) and training continues through them (documented
    in docs/COMPONENTS.md).

    Subclasses set ``self.train`` / ``self.eval`` (fused epoch/eval objects
    holding device arrays + schedules) and define the two batch makers.
    """

    def _make_train_batch(self, arrays, xs):
        raise NotImplementedError

    def _make_eval_batch(self, arrays, xs):
        raise NotImplementedError

    def _eval_schedule(self):
        raise NotImplementedError

    def _score(self, preds, ecms):
        """On-device selection score for one epoch's eval pass (the F1 side;
        loss-mode selection is handled in ``_build``). Subclasses with a
        non-CM selection metric (siamese vote F1) override this."""
        from ..ops.metrics import f1_from_cm_device

        return f1_from_cm_device(jnp.sum(ecms, axis=0), self.sel_average)

    def _step_valid(self, batch):
        """Validity predicate for a train step — fully-masked surplus steps
        (fold-shape bucketing) must be exact no-ops: gradients are already
        zero through the masked mean, but Adam moments/step would still
        advance. None disables gating (frame families: no bucketing)."""
        return None

    # set False on subclasses whose _build closures capture fold-specific
    # state (FusedSiameseRun's vote tables)
    _shareable = True

    def _compile(self):
        """Jit the run function, REUSING one jit wrapper per (runner type,
        selection config) on the Experiment: a fresh jax.jit per fold would
        re-trace and re-compile for every fold even when bucketing makes the
        shapes identical — sharing the callable turns folds 2..N into jit
        cache hits (the cold relay compile costs minutes per shape)."""
        if not self._shareable:
            self._fn = jax.jit(self._build(), donate_argnums=(0,))
            return
        key = (type(self).__name__, self.cfg.loss_or_f1, self.sel_average,
               getattr(self, "G", 1))
        cache = getattr(self.exp, "_fused_run_cache", None)
        if cache is None:
            cache = self.exp._fused_run_cache = {}
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(self._build(), donate_argnums=(0,))
            cache[key] = fn
        self._fn = fn

    def _build(self):
        from .optim import set_lr

        tstep = self.exp._make_step(train=True)
        estep = self.exp._make_step(train=False)
        use_loss = self.cfg.loss_or_f1 == "loss"
        mk_tb = self._make_train_batch
        mk_eb = self._make_eval_batch
        score_fn = self._score
        step_valid = self._step_valid

        def run(state: TrainState, tr_arrays, ev_arrays, sched, lrs,
                ev_sched):
            def epoch_body(carry, xs):
                state, best_score, best_ckpt = carry
                sched_e, lr_e = xs
                state = state.replace(opt_state=set_lr(state.opt_state, lr_e))

                def tbody(c, xs2):
                    batch = mk_tb(tr_arrays, xs2)
                    ns, met = tstep(c, batch)
                    valid = step_valid(batch)
                    if valid is not None:
                        ns = jax.lax.cond(valid, lambda a, _: a,
                                          lambda _, b: b, ns, c)
                    return ns, (met["cm"], met["loss"])

                state, (tcms, tlosses) = jax.lax.scan(tbody, state, sched_e)

                def ebody(c, xs2):
                    met = estep(c, mk_eb(ev_arrays, xs2))
                    return c, (met["preds"], met["probs"], met["cm"],
                               met["loss"])

                _, (preds, probs, ecms, elosses) = jax.lax.scan(
                    ebody, state, ev_sched)

                if use_loss:
                    # masked mean over the REAL eval steps (surplus bucket
                    # steps carry garbage losses)
                    w = ev_sched[1]
                    ev_valid = ((w if w.ndim == 1 else jnp.sum(w, axis=1))
                                > 0).astype(elosses.dtype)
                    score = (jnp.sum(elosses * ev_valid)
                             / jnp.maximum(jnp.sum(ev_valid), 1.0))
                else:
                    score = score_fn(preds, ecms)
                better = (score < best_score) if use_loss else (score > best_score)
                ckpt = {"params": state.params,
                        "batch_stats": state.batch_stats,
                        "constants": state.constants}
                best_ckpt = jax.tree.map(
                    lambda n, o: jnp.where(better, n, o), ckpt, best_ckpt)
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

    def run(self, state: TrainState, first_epoch: int, n_epochs: int):
        """Returns (final_state, best_ckpt, per-epoch stacked outputs):
        (tcms (E,S,C,C), tlosses (E,S), preds (E,Se,…), probs (E,Se,…),
        ecms (E,Se,C,C), elosses (E,Se), scores (E,))."""
        from .optim import epoch_lr

        epochs = range(first_epoch, first_epoch + n_epochs)
        scheds = [self.train.schedule(e) for e in epochs]
        sched = tuple(jnp.asarray(np.stack(col)) for col in zip(*scheds))
        lrs = jnp.asarray([epoch_lr(self.cfg, e) for e in epochs], np.float32)
        return self._fn(state, self.train.arrays, self.eval.arrays, sched,
                        lrs, self._eval_schedule())


class FusedWindowRun(_FusedRunBase):
    """Whole-run fusion for the window families (see _FusedRunBase)."""

    def __init__(
        self,
        exp: Experiment,
        cfg: ExperimentConfig,
        train_fold: WindowFold,
        test_fold: WindowFold,
        train_extras: Optional[Dict[str, np.ndarray]] = None,
        test_extras: Optional[Dict[str, np.ndarray]] = None,
    ):
        if exp.family != "window":
            raise ValueError("fused runs support the plain window family")
        self.cfg = cfg
        self.exp = exp
        q = cfg.fold_pad_quantum

        def _bucket(n):
            return -(-n // q) * q if q > 0 else n

        self.train = FusedWindowEpoch(exp, cfg, train_fold,
                                      extras=train_extras,
                                      bucket=_bucket(len(train_fold)))
        self.eval = FusedWindowEval(exp, cfg, test_fold, extras=test_extras,
                                    bucket=_bucket(len(test_fold)))
        self.n_test = self.eval.n
        # selection metric (loop.py::_average_for + _better)
        binary = cfg.error_type == "global" or cfg.siamese
        self.sel_average = "weighted" if binary else "macro"
        self._compile()

    def _make_train_batch(self, arrays, xs):
        s, m = xs
        return {**{k: v[s] for k, v in arrays.items()}, "mask": m}

    _make_eval_batch = _make_train_batch

    def _step_valid(self, batch):
        return jnp.any(batch["mask"] > 0)

    def _eval_schedule(self):
        return (self.eval._sel, self.eval._mask)


class FusedFrameRun(_FusedRunBase):
    """Whole-run fusion for the frame families — TeCNo / TransSVNet / COG
    (see _FusedRunBase). ``error_type == 'global'`` selects on weighted F1,
    macro otherwise, matching loop.py::train_frame_fold."""

    def __init__(self, exp: Experiment, cfg: ExperimentConfig,
                 train_batches, test_batches):
        self.cfg = cfg
        self.exp = exp
        self.train = FusedFrameEpoch(exp, cfg, train_batches)
        self.eval = FusedFrameEval(exp, cfg, test_batches)
        self.eval.host_batches = test_batches
        self.sel_average = ("weighted" if cfg.error_type == "global"
                            else "macro")
        self.G = self.train.G
        self._compile()

    def _make_train_batch(self, arrays, xs):
        s, w = xs
        batch = {k: v[s] for k, v in arrays.items()}
        if self.G > 1:
            batch["trial_weight"] = w
        return batch

    _make_eval_batch = _make_train_batch

    def _eval_schedule(self):
        return (self.eval._sel, self.eval._weight)


class FusedSiameseRun(_FusedRunBase):
    """Whole-run fusion for the siamese family. The pair arrays ride the
    window batch protocol (loop.py::_siamese_batches), but best-checkpoint
    selection replicates the per-epoch loop's VOTE metric: pair predictions
    are majority-voted per test-window position (loop.py::siamese_vote,
    reference modeling_utils.py:1180-1250) and the weighted F1 of the
    resulting 2x2 vote CM drives selection — entirely on device via a
    static position->group segment sum."""

    _shareable = False   # _score closes over per-fold vote tables

    def __init__(self, exp: Experiment, cfg: ExperimentConfig, siamese_data):
        if exp.family != "siamese":
            raise ValueError("FusedSiameseRun needs the siamese family")
        self.cfg = cfg
        self.exp = exp
        tr, te = siamese_data["train"], siamese_data["test"]
        self.train = FusedWindowEpoch(exp, cfg, arrays={
            "images": tr[0], "kinematics": tr[1], "labels": tr[2]})
        self.eval = FusedWindowEval(exp, cfg, arrays={
            "images": te[0], "kinematics": te[1], "labels": te[2]})
        self.n_test = self.eval.n
        # vote structures: positions/labels are static per fold
        pos = np.asarray(siamese_data["test_position_2"])
        uniq, inv = np.unique(pos, return_inverse=True)
        self._pos_inv = jnp.asarray(inv)
        self._n_groups = int(len(uniq))
        self._counts = jnp.asarray(
            np.bincount(inv, minlength=len(uniq)).astype(np.float32))
        wl = np.asarray(siamese_data["test_window_labels"])[uniq]
        self._vote_labels = jnp.asarray(wl.astype(np.int64))
        self.sel_average = "weighted"   # _better compares test_f1_weighted
        self._compile()

    def _score(self, preds, ecms):
        from ..ops.metrics import confusion_matrix, f1_from_cm_device

        pflat = preds.reshape(-1)[: self.n_test].astype(jnp.float32)
        sums = jax.ops.segment_sum(pflat, self._pos_inv,
                                   num_segments=self._n_groups)
        votes = (sums / self._counts >= 0.5).astype(jnp.int32)
        cm = confusion_matrix(self._vote_labels, votes, 2)
        return f1_from_cm_device(cm, "weighted")

    def _make_train_batch(self, arrays, xs):
        s, m = xs
        return {**{k: v[s] for k, v in arrays.items()}, "mask": m}

    _make_eval_batch = _make_train_batch

    def _eval_schedule(self):
        return (self.eval._sel, self.eval._mask)
