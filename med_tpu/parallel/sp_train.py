"""Sequence-parallel TRAINING MODE for the frame families.

:mod:`.seqpar` / :mod:`.sp_cog` / :mod:`.sp_tsvn` provide exact SP train
*steps*; this module turns them into the full frame training regime of the
reference (modeling_utils.py:1435-1758 — epochs, cosine LR, eval pass, best
checkpoint, resume) with every trial's time axis sharded over the mesh:

- trials are padded to ONE common bucket (a multiple of ``32 * n_shards``
  so the bit-packed dropout words and the fast path's 16x pool stay
  shard-local) and ``true_len < T`` is handled by the masked losses — the
  general :func:`..sp_cog.sp_cog_loss_masked` form, with per-track
  resampled labels/gates prepared host-side by :func:`_track_targets`
  exactly as ``losses.nearest_resample_dynamic`` + the ``true_out`` valid
  window (losses.py::cog_track_loss, engine.py::_cog_sequential_loss);
- dropout draws are GLOBAL functions of (step key, T) — independent of the
  shard count, so the whole training trajectory is invariant to how many
  devices the time axis is split over (pinned by
  tests/test_sp_train.py::test_sp_fold_shard_invariance);
- eval computes confusion matrices on device via one psum and gathers only
  per-trial predictions; history rows / selection (``loss_or_f1``) /
  checkpoint format mirror train/loop.py::train_frame_fold, and params come
  from the SAME ``Experiment.init_state`` — checkpoints interoperate with
  the single-chip engine.

Supported: TeCNo / TransSVNet / COG at every label regime the engine
implements for them (COG: global / all_errors / sequential with gates);
COG SRM/skill variants and ``trial_batch > 1`` stay on the single-chip /
trial-DP paths.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExperimentConfig
from ..ops.metrics import confusion_matrix
from ..train.engine import Experiment
from ..train.optim import epoch_lr, set_lr
from .seqpar import sp_dropout_masks, sp_tecno_forward
from .sp_cog import sp_cog_dropout, sp_cog_loss_masked
from .sp_tsvn import sp_tsvn_forward


# ---------------------------------------------------------------------------
# host-side target preparation (fixed per trial)
# ---------------------------------------------------------------------------


def _track_targets(labels, mask, true_len, t_track, gate=None, shift=False):
    """Per-track (labels, mask) on the track grid — the exact host replica
    of the engine's in-step resampling (losses.py::cog_track_loss for
    global/all_errors; engine.py::_cog_sequential_loss for sequential):
    nearest-resampled labels, the ``true_out`` validity window, and the
    resampled gate for the sequential regime. Uses the REAL
    ``nearest_resample_dynamic`` so rounding matches bit-for-bit."""
    from ..train.losses import nearest_resample_dynamic

    t_pad = labels.shape[0]
    lbl = np.maximum(labels - 1, 0) if shift else labels
    tl = np.asarray(nearest_resample_dynamic(
        jnp.asarray(lbl), jnp.asarray(true_len, jnp.int32), t_track))
    true_out = max((int(true_len) * t_track) // t_pad, 1)
    tm = (np.arange(t_track) < true_out).astype(np.float32)
    if gate is not None:
        m = (gate * mask).astype(np.float32)
        tg = np.asarray(nearest_resample_dynamic(
            jnp.asarray(m), jnp.asarray(true_len, jnp.int32), t_track))
        tm = tg * tm
    return tl.astype(np.int64), tm


# ---------------------------------------------------------------------------
# shared loss helpers (psum'd forms of train/losses.py)
# ---------------------------------------------------------------------------


def _soft_ce_psum(logits, labels, mask, axis_name):
    """Masked soft CE against [1-y, y] targets over global T
    (losses.py::soft_cross_entropy)."""
    y = labels.astype(logits.dtype)
    targets = jnp.stack([1.0 - y, y], axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(targets * logp, axis=-1)
    m = mask.astype(logits.dtype)
    num = lax.psum(jnp.sum(per * m), axis_name)
    den = lax.psum(jnp.sum(m), axis_name)
    return num / jnp.maximum(den, 1e-12)


def _cm_psum(labels, preds, n_classes, mask, axis_name):
    return lax.psum(
        confusion_matrix(labels, preds, n_classes, mask), axis_name)


# ---------------------------------------------------------------------------
# the trainer
# ---------------------------------------------------------------------------


class SPFrameTrainer:
    """Jitted SP train/eval steps for one frame family over a mesh.

    The TrainState is the stock engine state (params/opt_state/rng
    replicated, ``frozen`` for TSVN); batches arrive as dicts of T-sharded
    arrays built by :meth:`make_batch` + :meth:`shard`."""

    def __init__(self, cfg: ExperimentConfig, mesh: Mesh,
                 axis_name: str = "data"):
        if cfg.trial_batch != 1:
            raise ValueError("SP trains one (sharded) trial per step")
        if cfg.model_name == "COG" and (cfg.SRM or cfg.use_skill_prompt):
            raise NotImplementedError(
                "SP COG covers the base chain (SRM/skill variants stay on "
                "the single-chip path)")
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis_name
        self.n_shards = int(mesh.shape[axis_name])
        # bit-packed dropout words + the fast path's 16x pool must stay
        # shard-local: every trial pads to a multiple of this quantum
        self.quantum = 32 * self.n_shards
        self.exp = Experiment(cfg)
        self.family = self.exp.family
        if self.family not in ("tecno", "tsvn", "cog"):
            raise ValueError("SP training covers the frame families")
        self.tx = self.exp.tx
        self._train = jax.jit(self._make_step(train=True),
                              donate_argnums=(0,))
        self._eval = jax.jit(self._make_step(train=False))

    # ------------------------------------------------------------- batches
    def bucket_for(self, trials) -> int:
        max_t = max(t.n_frames for t in trials)
        cap = self.cfg.max_frames
        t = min(max_t, cap) if cap else max_t
        return -(-t // self.quantum) * self.quantum

    def make_batch(self, trial, bucket: int, gate=None) -> Dict[str, Any]:
        """Padded per-trial arrays WITHOUT a leading batch axis (the trial
        IS the step); includes the per-track targets for COG."""
        cfg = self.cfg
        T = min(trial.n_frames, bucket)
        Tp = bucket

        def pad(x, value=0):
            if x.ndim == 1:
                return np.pad(x[:T], (0, Tp - T), constant_values=value)
            return np.pad(x[:T], ((0, Tp - T), (0, 0)),
                          constant_values=value)

        labels = trial.labels_for(cfg.error_type)[:T]
        labels = np.pad(labels, (0, Tp - T)).astype(np.int64)
        mask = np.pad(np.ones(T, np.float32), (0, Tp - T))
        batch = {"labels": labels, "mask": mask}
        if cfg.data_type != "video":
            batch["kinematics"] = pad(trial.kinematics).astype(np.float32)
        if cfg.data_type != "kinematics":
            batch["images"] = pad(trial.images).astype(np.float32)
        g = None
        if gate is not None:
            g = pad(gate.astype(np.float32))
            batch["gate"] = g
        elif cfg.error_type == "sequential":
            g = (labels != 0).astype(np.float32) * mask
            batch["gate"] = g
        if self.family == "cog":
            seq = cfg.error_type == "sequential"
            tlf, tmf = _track_targets(labels, mask, T, Tp, gate=g,
                                      shift=seq)
            tla, tma = _track_targets(labels, mask, T, Tp // 16, gate=g,
                                      shift=seq)
            batch.update(tl_full=tlf, tm_full=tmf,
                         tl_fast=tla, tm_fast=tma)
        batch["_true_len"] = T
        batch["_name"] = trial.name
        batch["_gestures"] = pad(trial.g_labels)
        return batch

    def shard(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if k.startswith("_"):
                out[k] = v
                continue
            arr = jnp.asarray(v)
            out[k] = jax.device_put(arr, NamedSharding(
                self.mesh, P(self.axis, *([None] * (arr.ndim - 1)))))
        return out

    def init_state(self, rng, sample_trial, bucket: int, frozen=None):
        """Engine-format init so params/checkpoints match the single-chip
        fold exactly (same key -> same tree)."""
        from ..data.datasets import frame_batch

        b = frame_batch(sample_trial, self.cfg, bucket=bucket)
        b = {k: v for k, v in b.items() if not k.startswith("_")}
        if self.family == "tsvn":
            b["tecno_logits"] = np.zeros(
                (1, b["labels"].shape[0], self.cfg.out_features), np.float32)
        return self.exp.init_state(rng, b, frozen=frozen)

    # --------------------------------------------------------------- steps
    def _assemble(self, params, batch):
        """engine._assemble on a LOCAL (T_local, …) block — the FE MLP is
        frame-local, so input assembly needs no communication."""
        cfg = self.cfg
        if cfg.data_type == "kinematics":
            return batch["kinematics"]
        images = batch["images"]
        if cfg.uses_feature_extractor():
            images = self.exp.fe.apply({"params": params["fe"]}, images)
        if cfg.data_type == "video":
            return images
        return jnp.concatenate([images, batch["kinematics"]], axis=-1)

    def _forward_loss(self, params, constants, frozen, batch, dropout):
        """(loss, final_logits) on local blocks; final_logits is the
        prediction track (engine.py::_loss_for_family per family)."""
        cfg = self.cfg
        axis = self.axis
        x = self._assemble(params, batch)
        if self.family == "tecno":
            logits = sp_tecno_forward(
                params["model"], x, num_stages=cfg.mstcn_stages,
                axis_name=axis, masks=dropout,
                dropout_rate=0.5 if dropout is not None else 0.0)
            per = [_soft_ce_psum(s, batch["labels"], batch["mask"], axis)
                   for s in logits]
            loss = sum(per) / len(per)
            return loss, logits[-1]
        if self.family == "tsvn":
            x_frozen = lax.stop_gradient(x)
            tecno_out = sp_tecno_forward(
                frozen["tecno_params"], x_frozen,
                num_stages=cfg.mstcn_stages, axis_name=axis, masks=None,
                dropout_rate=0.0)
            tecno_logits = lax.stop_gradient(tecno_out[-1])
            out = sp_tsvn_forward(
                params["model"], tecno_logits, x, len_q=cfg.sequence_length,
                f_maps=cfg.mstcn_f_maps, axis_name=axis)
            loss = _soft_ce_psum(out, batch["labels"], batch["mask"], axis)
            return loss, out
        # cog
        loss, out_list = sp_cog_loss_masked(
            params["model"], constants["model"], x,
            batch["tl_full"], batch["tm_full"],
            batch["tl_fast"], batch["tm_fast"],
            num_r=cfg.num_R, len_q=cfg.sequence_length,
            smooth_lambda=cfg.smooth_lambda, axis_name=axis,
            use_pallas=cfg.use_pallas, dropout=dropout)
        return loss, out_list[0]

    def _metrics(self, final_logits, batch):
        """Psum'd CM + local preds/probs (engine's per-family metric
        block)."""
        cfg = self.cfg
        axis = self.axis
        labels = batch["labels"]
        mask = batch["mask"]
        if cfg.error_type == "sequential":
            preds = jnp.argmax(final_logits, axis=-1) + 1
            gate = batch["gate"]
            gated = jnp.where(gate > 0, preds, 0)
            cm = _cm_psum(labels, gated, 6, mask, axis)
            probs = jax.nn.softmax(final_logits, axis=-1)
            return cm, preds, probs
        n_classes = 2 if cfg.error_type == "global" else cfg.out_features
        preds = jnp.argmax(final_logits, axis=-1)
        cm = _cm_psum(labels, preds, n_classes, mask, axis)
        probs = jax.nn.softmax(final_logits, axis=-1)
        if n_classes == 2:
            probs = probs[..., 1]
        return cm, preds, probs

    def _dropout(self, key, T):
        cfg = self.cfg
        if self.family == "tecno":
            masks = sp_dropout_masks(
                key, num_stages=cfg.mstcn_stages,
                num_layers=cfg.mstcn_layers, T=T,
                channels=cfg.mstcn_f_maps)
            return masks, P(None, None, self.axis)
        if self.family == "cog":
            dp = sp_cog_dropout(
                key, T=T, channels=cfg.mstcn_f_maps,
                num_layers_basic=cfg.num_layers_Basic,
                num_layers_r=cfg.num_layers_R, num_r=cfg.num_R)
            specs = {"ch_TCN": P(), "ch_fast": P(),
                     "TCN": P(None, self.axis),
                     "fast_stage1": P(None, self.axis)}
            for r in range(cfg.num_R):
                specs[f"R{r}"] = P(None, self.axis)
                specs[f"fast_R{r}"] = P(None, self.axis)
            return dp, specs
        return None, P()  # tsvn refiner has no dropout

    def _batch_specs(self, batch):
        return {k: P(self.axis) if jnp.asarray(v).ndim == 1
                else P(self.axis, *([None] * (jnp.asarray(v).ndim - 1)))
                for k, v in batch.items() if not k.startswith("_")}

    def _make_step(self, train: bool):
        axis = self.axis
        mesh = self.mesh

        def local_train(params, constants, frozen, batch, dropout):
            def loss_fn(p):
                loss, final = self._forward_loss(
                    p, constants, frozen, batch, dropout)
                cm, _, _ = self._metrics(final, batch)
                return loss, cm

            (loss, cm), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # no grad psum: the loss psums transpose into summed cotangents
            # on every shard (seqpar.py module docstring)
            return loss, cm, grads

        def local_eval(params, constants, frozen, batch):
            loss, final = self._forward_loss(
                params, constants, frozen, batch, None)
            cm, preds, probs = self._metrics(final, batch)
            return loss, cm, preds, probs

        if train:

            def step(state, batch):
                rng, drop = jax.random.split(state.rng)
                data = {k: v for k, v in batch.items()
                        if not k.startswith("_")}
                T = data["labels"].shape[0]
                dropout, dp_specs = self._dropout(drop, T)
                bspecs = self._batch_specs(data)
                loss, cm, grads = jax.shard_map(
                    local_train, mesh=mesh,
                    in_specs=(P(), P(), P(), bspecs, dp_specs),
                    out_specs=(P(), P(), P()),
                )(state.params, state.constants, state.frozen, data,
                  dropout)
                updates, new_opt = self.tx.update(
                    grads, state.opt_state, state.params)
                new_params = jax.tree.map(
                    lambda p, u: p + u, state.params, updates)
                return (
                    state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, rng=rng),
                    {"loss": loss, "cm": cm},
                )

            return step

        def estep(state, batch):
            data = {k: v for k, v in batch.items() if not k.startswith("_")}
            bspecs = self._batch_specs(data)
            loss, cm, preds, probs = jax.shard_map(
                local_eval, mesh=mesh,
                in_specs=(P(), P(), P(), bspecs),
                out_specs=(P(), P(), P(axis), P(axis)),
            )(state.params, state.constants, state.frozen, data)
            return {"loss": loss, "cm": cm, "preds": preds, "probs": probs}

        return estep

    def train_step(self, state, batch):
        return self._train(state, {k: v for k, v in batch.items()
                                   if not k.startswith("_")})

    def eval_step(self, state, batch):
        return self._eval(state, {k: v for k, v in batch.items()
                                  if not k.startswith("_")})


# ---------------------------------------------------------------------------
# the fold loop (train/loop.py::train_frame_fold under SP)
# ---------------------------------------------------------------------------


def train_sp_frame_fold(
    cfg: ExperimentConfig,
    train_trials: List,
    test_trials: List,
    mesh: Mesh,
    tracker=None,
    frozen: Any = None,
    gates: Optional[Dict] = None,
    tag: str = "",
    resume: bool = False,
    bucket: Optional[int] = None,
) -> Dict[str, Any]:
    """Frame-fold training with the time axis sharded over ``mesh``: same
    bookkeeping as train/loop.py::train_frame_fold (per-epoch cosine LR,
    pooled train/eval metrics, ``loss_or_f1`` best selection, per-epoch
    resume snapshots), SP steps instead of single-chip ones.

    ``bucket``: pin the padded trial length (must be a multiple of the
    trainer quantum). The dropout draw depends on the padded T, so runs on
    DIFFERENT shard counts are trajectory-identical only when they share a
    bucket — pass the widest mesh's bucket to compare."""
    from ..train.loop import _better, _epoch_metrics
    from ..train.checkpoint import load_train_state, save_train_state

    trainer = SPFrameTrainer(cfg, mesh)
    average = "binary" if cfg.error_type == "global" else "macro"
    if bucket is None:
        bucket = trainer.bucket_for(list(train_trials) + list(test_trials))
    elif bucket % trainer.quantum:
        raise ValueError(f"bucket {bucket} not a multiple of the trainer "
                         f"quantum {trainer.quantum}")

    def batches_for(trials, split):
        out = []
        for t in trials:
            g = gates[split].get(t.name) if gates is not None else None
            out.append(trainer.make_batch(t, bucket, gate=g))
        return out

    train_batches = [trainer.shard(b) for b in batches_for(train_trials,
                                                           "train")]
    test_host = batches_for(test_trials, "test")
    test_batches = [trainer.shard(b) for b in test_host]

    state = trainer.init_state(jax.random.key(cfg.seed), train_trials[0],
                               bucket, frozen=frozen)
    start_epoch = 0
    resume_path = (tracker.checkpoint_path(f"last_state_{tag}.npz")
                   if tracker and tag else None)
    if resume and resume_path and os.path.exists(resume_path):
        state, start_epoch = load_train_state(resume_path, state)
        print(f"[{tag}] resumed at epoch {start_epoch}")

    best, best_ckpt, history = None, None, []
    import time

    for epoch in range(start_epoch, cfg.n_epochs):
        state = state.replace(
            opt_state=set_lr(state.opt_state, epoch_lr(cfg, epoch)))
        t0 = time.time()
        order = np.random.default_rng(cfg.seed + epoch).permutation(
            len(train_batches))
        cms, losses = [], []
        for i in order:
            state, m = trainer.train_step(state, train_batches[i])
            cms.append(m["cm"])
            losses.append(m["loss"])
        train_time = time.time() - t0
        train_m = _epoch_metrics([np.asarray(c) for c in cms], average,
                                 per_batch=False)
        train_loss = float(np.mean([float(l) for l in losses]))
        if not np.isfinite(train_loss):
            print(f"[{tag}] non-finite train loss at epoch {epoch}; "
                  "stopping")
            break

        ev = evaluate_sp_frame_fold(cfg, trainer, state, test_trials,
                                    test_batches, test_host)
        row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "train_f1": train_m["f1"],
            "train_f1_weighted": train_m.get("f1_weighted", train_m["f1"]),
            "train_acc": train_m["accuracy"],
            "train_jaccard": train_m["jaccard"],
            "train_time": train_time,
            **{f"test_{k}": v for k, v in ev["metrics"].items()},
        }
        history.append(row)
        if tracker:
            tracker.log_metrics(
                {k: v for k, v in row.items() if np.isscalar(v)}, step=epoch)
        if _better(cfg, row, best):
            best = dict(row)
            best.update({k: ev[k] for k in
                         ("preds", "probs", "labels", "raw_labels",
                          "gestures", "subjects", "cm")})
            best_ckpt = jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants})
        if resume_path:
            save_train_state(resume_path, state, epoch)

    return {"best": best, "history": history, "checkpoint": best_ckpt,
            "exp": trainer}


def evaluate_sp_frame_fold(cfg, trainer, state, test_trials, test_batches,
                           host_batches) -> Dict:
    """Pooled SP eval pass (loop.py::evaluate_frame_fold semantics): CMs
    psum'd on device, predictions gathered per trial and trimmed to
    true_len on host."""
    from ..train.loop import _epoch_metrics

    import time

    average = "binary" if cfg.error_type == "global" else "macro"
    preds, probs, labels, gests, subjects, cms, losses = \
        [], [], [], [], [], [], []
    raw_labels = []
    t_infer, n_frames = 0.0, 0
    for trial, batch, hb in zip(test_trials, test_batches, host_batches):
        t0 = time.time()
        m = trainer.eval_step(state, batch)
        jax.block_until_ready(m["preds"])
        t_infer += time.time() - t0
        T = int(hb["_true_len"])
        preds.append(np.asarray(m["preds"])[:T])
        probs.append(np.asarray(m["probs"])[:T])
        labels.append(np.asarray(hb["labels"])[:T])
        gests.append(np.asarray(hb["_gestures"])[:T])
        if trial.e_raw is not None:
            raw_labels.append(trial.e_raw[:T])
        subjects.extend([trial.name] * T)
        n_frames += T
        cms.append(np.asarray(m["cm"]))
        losses.append(float(m["loss"]))
    pooled = _epoch_metrics(cms, average, per_batch=False)
    return {
        "metrics": {
            "loss": float(np.mean(losses)),
            "f1": pooled["f1"],
            "f1_weighted": pooled.get("f1_weighted", pooled["f1"]),
            "acc": pooled["accuracy"],
            "jaccard": pooled["jaccard"],
            "inference_ms_per_frame": t_infer / max(n_frames, 1) * 1e3,
        },
        "preds": np.concatenate(preds),
        "probs": np.concatenate(probs),
        "labels": np.concatenate(labels),
        "raw_labels": np.concatenate(raw_labels) if raw_labels else None,
        "gestures": np.concatenate(gests),
        "subjects": np.asarray(subjects, dtype=object),
        "cm": pooled["cm"],
    }
