"""Jit-compiled train/eval steps for every experiment family.

One donated, jitted ``train_step`` per family replaces the reference's nine
near-duplicate epoch functions (modeling_utils.py:300-2187):

=================  ========================================================
family             reference counterpart
=================  ========================================================
window             train/validate_single_epoch (binary BCE), _ES (6-class
                   CE), _Sequential (masked 5-class CE)
siamese            train/validate_single_epoch_siamese (pair BCE)
tecno              frame binary, stage-averaged soft CE (compute_loss)
tsvn               frozen TeCNo -> TransSVNet, soft CE (train_..._TSVN)
cog                multi-track CE + λ·smoothing (train_..._COG, fusion),
                   plus the _ES / _Sequential label regimes
=================  ========================================================

Design notes (TPU-first):
- metrics are integer confusion matrices accumulated on device
  (ops.metrics); nothing syncs to host inside the epoch;
- batches are fixed-shape with an explicit example mask (the last partial
  batch is padded), so each family compiles exactly once;
- frame trials are right-padded to bucket lengths with frame masks — all
  temporal ops are causal, so valid positions are unaffected (SURVEY.md §7);
- the feature extractor and model are trained jointly under one optimizer
  (reference modeling_utils.py:220-222) by nesting both param trees in a
  single state.
"""

from __future__ import annotations


from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..models import build_feature_extractor, build_model
from ..ops.metrics import confusion_matrix
from . import losses
from .optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    rng: jnp.ndarray
    frozen: Any = None  # frozen upstream models (TeCNo for TSVN, etc.)


class Experiment:
    """Binds a config to its model(s), optimizer and jitted steps."""

    def __init__(self, cfg: ExperimentConfig, prompt_path: Optional[str] = None):
        self.cfg = cfg
        self.model = build_model(cfg, prompt_path=prompt_path)
        self.fe = build_feature_extractor(cfg)
        self.family = self._family()
        # Optional: frame families hold params as ONE flat vector. Measured
        # SLOWER than the per-leaf tree on v5e (the unflatten slice fan-out
        # does not fuse into the forward — see config.flat_params), so the
        # default is the plain tree with per-leaf Adam states (optim.py).
        self._flat = (cfg.flat_params
                      and self.family in ("tecno", "tsvn", "cog"))
        self._unravel = None
        self.tx = make_optimizer(cfg, flat=self._flat)
        # TransSVNet refines a frozen TeCNo instantiated from the same config
        # with the model name swapped (reference modeling_utils.py:2263-2268);
        # only its *params* travel in state.frozen — the module is static.
        if self.family == "tsvn":
            from ..models.tcn import TeCNo

            self.frozen_tecno = TeCNo(
                num_stages=cfg.mstcn_stages,
                num_layers=cfg.mstcn_layers,
                f_maps=cfg.mstcn_f_maps,
                in_dim=cfg.in_features(),
                out_classes=cfg.out_features,
                causal=cfg.mstcn_causal_conv,
            )
        self._train_step = jax.jit(self._make_step(train=True), donate_argnums=(0,))
        self._eval_step = jax.jit(self._make_step(train=False))

    # ------------------------------------------------------------------
    def _family(self) -> str:
        name = self.cfg.model_name
        if name in ("Siamese_CNN", "Siamese_LSTM"):
            return "siamese"
        if name in ("SimpleCNN", "SimpleLSTM"):
            return "window"
        if name == "TeCNo":
            return "tecno"
        if name == "TransSVNet":
            return "tsvn"
        if name == "COG":
            return "cog"
        raise ValueError(name)

    # ------------------------------------------------------------------
    def init_state(
        self,
        rng: jax.Array,
        sample_batch: Dict[str, np.ndarray],
        frozen: Any = None,
        class_counts: Optional[np.ndarray] = None,
    ) -> TrainState:
        rng, pk_fe, pk, dk = jax.random.split(rng, 4)
        params: Dict[str, Any] = {}
        batch_stats: Dict[str, Any] = {}
        constants: Dict[str, Any] = {}

        if self.fe is not None:
            fv = self.fe.init({"params": pk_fe}, self._images(sample_batch))
            params["fe"] = fv["params"]
        model_inputs = self._model_inputs(params, sample_batch)
        mv = self.model.init(
            {"params": pk, "dropout": dk}, *model_inputs, train=False
        )
        params["model"] = mv["params"]
        if "batch_stats" in mv:
            batch_stats["model"] = mv["batch_stats"]
        if "constants" in mv:
            constants["model"] = mv["constants"]
        if class_counts is not None:
            constants["class_counts"] = jnp.asarray(class_counts, jnp.float32)

        if self._flat:
            from jax.flatten_util import ravel_pytree

            flat, unravel = ravel_pytree(params)
            self._unravel = unravel
            params = {"flat": flat}
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            constants=constants,
            opt_state=opt_state,
            rng=rng,
            frozen=frozen,
        )

    def train_step(self, state: TrainState, batch):
        return self._train_step(state, batch)

    def eval_step(self, state: TrainState, batch):
        return self._eval_step(state, batch)

    def params_tree(self, params):
        """The nested param tree for a (possibly flat) ``state.params`` —
        the boundary adapter for checkpointing/serving, which always see
        trees."""
        if self._flat and isinstance(params, dict) and set(params) == {"flat"}:
            return self._unravel(params["flat"])
        return params

    # ----------------------------------------------------------- internals
    def _images(self, batch):
        img = batch["images"]
        return img

    def _model_inputs(self, params, batch):
        """Host-side version of input assembly for init (no gradients)."""
        x = self._assemble(params, batch, train=False, rng=None)
        if self.family == "siamese":
            return (x[:, 0], x[:, 1])
        if self.family == "tsvn":
            return (batch["tecno_logits"], x)
        return (x,)

    def _assemble(self, params, batch, train=False, rng=None):
        """define_inputs (modeling_utils.py:19-134) in channel-last layout."""
        cfg = self.cfg
        if cfg.data_type == "kinematics":
            return batch["kinematics"]
        images = batch["images"]
        if cfg.uses_feature_extractor():
            images = self.fe.apply({"params": params["fe"]}, images)
        if cfg.data_type == "video":
            return images
        return jnp.concatenate([images, batch["kinematics"]], axis=-1)

    # ------------------------------------------------------------------
    def _make_step(self, train: bool):
        family = self.family
        cfg = self.cfg

        def loss_and_metrics(params, batch_stats, constants, frozen, batch, rng, train):
            params = self.params_tree(params)
            x = self._assemble(params, batch, train, rng)
            variables = {"params": params["model"]}
            if "model" in batch_stats:
                variables["batch_stats"] = batch_stats["model"]
            if "model" in constants:
                variables["constants"] = constants["model"]

            apply_kw = dict(train=train, mutable=["batch_stats"] if (train and "model" in batch_stats) else False)
            if train:
                apply_kw["rngs"] = {"dropout": rng}

            if family == "siamese":
                out = self.model.apply(variables, x[:, 0], x[:, 1], **apply_kw)
            elif family == "tsvn":
                # Stop gradients at TeCNo's INPUT, not just its output: x
                # carries FE-param tangents, and a tangent-carrying input
                # makes the custom-VJP pick the *saving* forward — 8 stages
                # of per-layer residuals (L,T,C) written to HBM for a
                # backward that the output stop_gradient then discards
                # (and a VMEM OOM at T=8192). The output stop already
                # killed d(x)/d(fe) through TeCNo, so this is the same
                # function, computed by the save-free primal.
                tecno_out = self.frozen_tecno.apply(
                    {"params": frozen["tecno_params"]},
                    jax.lax.stop_gradient(x), train=False
                )
                tecno_logits = jax.lax.stop_gradient(tecno_out[-1])
                out = self.model.apply(variables, tecno_logits, x, **apply_kw)
            else:
                out = self.model.apply(variables, x, **apply_kw)
            if train and "model" in batch_stats:
                out, mutated = out
                new_stats = {"model": mutated["batch_stats"]}
            else:
                new_stats = batch_stats

            loss, metrics = _loss_for_family(cfg, family, out, batch, constants)
            return loss, (metrics, new_stats)

        # Trial-parallel frame training: vmap the per-trial loss over a
        # leading trial axis and average the gradients. Frame models carry no
        # batch stats, so the vmap is exact per-trial compute; the averaged
        # gradient is a *larger-batch* regime than the reference's
        # batch_size=1 (documented deviation, off by default).
        trial_parallel = (
            family in ("tecno", "tsvn", "cog") and cfg.trial_batch > 1
        )

        def batched_loss(params, batch_stats, constants, frozen, batch, rngs,
                         train_flag):
            def per_trial(b, r):
                return loss_and_metrics(
                    params, batch_stats, constants, frozen, b, r, train_flag
                )

            losses_v, (metrics_v, _) = jax.vmap(
                per_trial, in_axes=(0, 0)
            )(batch, rngs)
            w = batch.get("trial_weight")
            if w is None:
                loss = jnp.mean(losses_v)
            else:
                # padded group slots carry weight 0
                loss = jnp.sum(losses_v * w) / jnp.maximum(jnp.sum(w), 1e-12)
            metrics = dict(metrics_v)
            for key in list(metrics):
                if key.startswith("cm"):
                    wcm = (w if w is not None else jnp.ones(losses_v.shape[0]))
                    metrics[key] = jnp.sum(
                        metrics[key] * wcm[:, None, None].astype(jnp.int32),
                        axis=0,
                    )
            return loss, (metrics, batch_stats)

        if train:

            def step(state: TrainState, batch):
                rng, drop = jax.random.split(state.rng)

                if trial_parallel:
                    weight = batch.get("trial_weight")
                    data = {k: v for k, v in batch.items()
                            if k != "trial_weight"}
                    drops = jax.random.split(drop, cfg.trial_batch)

                    def lf(params):
                        return batched_loss(
                            params, state.batch_stats, state.constants,
                            state.frozen,
                            {**data, "trial_weight": weight}
                            if weight is not None else data,
                            drops, True,
                        )
                else:

                    def lf(params):
                        return loss_and_metrics(
                            params, state.batch_stats, state.constants,
                            state.frozen, batch, drop, True,
                        )

                (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                    lf, has_aux=True
                )(state.params)
                updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
                metrics["loss"] = loss
                return (
                    state.replace(
                        step=state.step + 1,
                        params=new_params,
                        batch_stats=new_stats,
                        opt_state=new_opt,
                        rng=rng,
                    ),
                    metrics,
                )

            return step

        def estep(state: TrainState, batch):
            if trial_parallel:
                rngs = jax.random.split(state.rng, cfg.trial_batch)
                loss, (metrics, _) = batched_loss(
                    state.params, state.batch_stats, state.constants,
                    state.frozen, batch, rngs, False,
                )
            else:
                loss, (metrics, _) = loss_and_metrics(
                    state.params, state.batch_stats, state.constants,
                    state.frozen, batch, state.rng, False,
                )
            metrics["loss"] = loss
            return metrics

        return estep


# ---------------------------------------------------------------------------
# per-family losses + on-device metrics
# ---------------------------------------------------------------------------


def _loss_for_family(cfg: ExperimentConfig, family: str, out, batch, constants):
    mask = batch.get("mask")
    labels = batch["labels"]
    pos_weight = None
    class_weights = None
    if cfg.pos_weight and "class_counts" in constants:
        cc = constants["class_counts"]
        if cfg.error_type == "global":
            pos_weight = cc[0] / cc[1]
        else:
            class_weights = cc

    if family in ("window", "siamese"):
        if family == "siamese" or cfg.error_type == "global":
            logits = out.reshape(-1)
            loss = losses.bce_with_logits(logits, labels, mask, pos_weight)
            preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int32)
            cm = confusion_matrix(labels, preds, 2, mask)
            return loss, {"cm": cm, "probs": jax.nn.sigmoid(logits), "preds": preds}
        if cfg.error_type == "all_errors":
            loss = losses.cross_entropy(out, labels, mask, class_weights)
            preds = jnp.argmax(out, axis=-1)
            cm = confusion_matrix(labels, preds, cfg.out_features, mask)
            cm_bin = confusion_matrix(
                (labels > 0).astype(jnp.int32), (preds > 0).astype(jnp.int32), 2, mask
            )
            return loss, {
                "cm": cm, "cm_binary": cm_bin,
                "probs": jax.nn.softmax(out, axis=-1), "preds": preds,
            }
        if cfg.error_type == "sequential":
            # labels are powerset classes 0..5; train only on true errors,
            # targets shifted to 0..4 (reference modeling_utils.py:611-625).
            # Predictions are gated by batch['gate'] — true labels during
            # training, the frozen binary stage's predictions at eval
            # (reference validate_single_epoch_Sequential :977-998).
            err_mask = (labels != 0).astype(jnp.float32)
            m = err_mask if mask is None else err_mask * mask
            loss = losses.cross_entropy(out, jnp.maximum(labels - 1, 0), m)
            preds = jnp.argmax(out, axis=-1) + 1
            gate = batch.get("gate", err_mask)
            gated = jnp.where(gate > 0, preds, 0)
            cm_all = confusion_matrix(labels, gated, 6, mask)
            cm_spec = confusion_matrix(
                jnp.maximum(labels - 1, 0), preds - 1, 5, m
            )
            return loss, {
                "cm": cm_all, "cm_specific": cm_spec,
                "probs": jax.nn.softmax(out, axis=-1), "preds": preds,
            }
        raise ValueError(cfg.error_type)

    if family in ("tecno", "tsvn"):
        if family == "tecno":
            final = out[-1]  # (B, T, 2)
            loss = losses.tecno_stage_loss(out, labels, mask)
        else:
            final = out
            y = labels.astype(final.dtype)
            targets = jnp.stack([1.0 - y, y], axis=-1)
            loss = losses.soft_cross_entropy(final, targets, mask)
        preds = jnp.argmax(final, axis=-1).reshape(-1)
        probs = jax.nn.softmax(final, axis=-1)[..., 1].reshape(-1)
        cm = confusion_matrix(labels, preds, 2, mask)
        return loss, {"cm": cm, "probs": probs, "preds": preds}

    if family == "cog":
        out_list, _ = out
        true_len = batch["true_len"]
        n_stages = len(out_list)
        if cfg.error_type == "sequential":
            return _cog_sequential_loss(cfg, out_list, batch, n_stages)
        if cfg.error_type == "global":
            lbl = labels
            n_classes = 2
        else:  # all_errors
            lbl = labels
            n_classes = cfg.out_features
        ce_total, sm_total = 0.0, 0.0
        for track in out_list:
            ce, sm = losses.cog_track_loss(track, lbl, true_len, cfg.smooth_lambda,
                                           class_weights)
            ce_total += ce
            sm_total += sm
        loss = ce_total / n_stages + cfg.smooth_lambda * (sm_total / n_stages)
        track0 = out_list[0][0]
        preds = jnp.argmax(track0, axis=-1)
        probs = jax.nn.softmax(track0, axis=-1)
        cm = confusion_matrix(lbl, preds, n_classes, mask)
        metrics = {"cm": cm, "preds": preds, "probs": probs[..., 1] if n_classes == 2 else probs}
        if cfg.error_type == "all_errors":
            metrics["cm_binary"] = confusion_matrix(
                (lbl > 0).astype(jnp.int32), (preds > 0).astype(jnp.int32), 2, mask
            )
        return loss, metrics

    raise ValueError(family)


def _cog_sequential_loss(cfg, out_list, batch, n_stages):
    """Stage-2 COG: 5-class CE + smoothing masked to error frames
    (reference modeling_utils.py:1761-2187). ``batch['gate']`` carries the
    gating mask (true labels during training, binary-stage predictions at
    eval; reference `use_true_binary_labels_train`)."""
    labels = batch["labels"]  # powerset class 0..5
    true_len = batch["true_len"]
    gate = batch["gate"].astype(jnp.float32)  # (Tpad,)
    mask = batch.get("mask")
    m = gate if mask is None else gate * mask

    ce_total, sm_total = 0.0, 0.0
    tpad = labels.shape[0]
    shifted = jnp.maximum(labels - 1, 0)
    for track in out_list:
        logits = track[0]
        t_track = logits.shape[0]
        track_labels = losses.nearest_resample_dynamic(shifted, true_len, t_track)
        track_gate = losses.nearest_resample_dynamic(m, true_len, t_track)
        true_out = jnp.maximum((true_len * t_track) // tpad, 1)
        valid = (jnp.arange(t_track) < true_out).astype(jnp.float32)
        tm = track_gate * valid
        ce_total += losses.cross_entropy(logits, track_labels, tm)
        sm_total += losses.smooth_loss(logits, (tm[1:] * tm[:-1]))
    loss = ce_total / n_stages + cfg.smooth_lambda * (sm_total / n_stages)

    track0 = out_list[0][0]
    preds = jnp.argmax(track0, axis=-1) + 1
    gated = jnp.where(gate > 0, preds, 0)
    cm_all = confusion_matrix(labels, gated, 6, mask)
    cm_spec = confusion_matrix(shifted, preds - 1, 5, m)
    return loss, {
        "cm": cm_all, "cm_specific": cm_spec, "preds": preds,
        "probs": jax.nn.softmax(track0, axis=-1),
    }
