"""Live multi-model ensemble inference.

The reference's "ensembling" re-scores stored predictions offline
(ensemble.ipynb; SURVEY.md §3.5 — there is no serving path). Here the fused
ensembles run as ONE jit-compiled program over a device mesh: every member
model's forward plus the fusion rule compile together, the batch is sharded
over the 'data' axis, and XLA overlaps the members' compute. Covers both
reference ensembles:

- soft vote: mean of member positive-class probabilities >= 0.5 (cell 6);
- cascade: binary member gates a multi-class member (cell 15).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..models import build_feature_extractor, build_model


class WindowModelBundle:
    """One window model + its feature extractor and trained variables."""

    def __init__(self, cfg: ExperimentConfig, checkpoint: Dict):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.fe = build_feature_extractor(cfg)
        self.params = checkpoint["params"]
        self.batch_stats = checkpoint.get("batch_stats", {})

    def logits(self, images, kinematics):
        cfg = self.cfg
        if cfg.data_type == "kinematics":
            x = kinematics
        else:
            feats = images
            if self.fe is not None:
                feats = self.fe.apply({"params": self.params["fe"]}, images)
            x = (
                feats
                if cfg.data_type == "video"
                else jnp.concatenate([feats, kinematics], axis=-1)
            )
        variables = {"params": self.params["model"]}
        if self.batch_stats.get("model") is not None:
            variables["batch_stats"] = self.batch_stats["model"]
        return self.model.apply(variables, x, train=False)


class EnsembleServer:
    """jit-compiled fused inference over N member models."""

    def __init__(
        self,
        members: List[WindowModelBundle],
        mode: str = "soft_vote",
        mesh=None,
        threshold: float = 0.5,
    ):
        if mode not in ("soft_vote", "cascade"):
            raise ValueError(mode)
        if mode == "cascade" and len(members) != 2:
            raise ValueError("cascade needs exactly (binary, multiclass) members")
        self.members = members
        self.mode = mode
        self.mesh = mesh
        self.threshold = threshold
        self._predict = jax.jit(self._build())

    def _build(self):
        members, mode, thr = self.members, self.mode, self.threshold

        def predict(images, kinematics):
            if mode == "soft_vote":
                probs = [
                    jax.nn.sigmoid(m.logits(images, kinematics).reshape(-1))
                    for m in members
                ]
                p = sum(probs) / len(probs)
                return (p >= thr).astype(jnp.int32), p
            binary, multi = members
            b_logits = binary.logits(images, kinematics).reshape(-1)
            b_pred = (jax.nn.sigmoid(b_logits) > thr).astype(jnp.int32)
            m_logits = multi.logits(images, kinematics)
            m_pred = jnp.argmax(m_logits, axis=-1).astype(jnp.int32)
            return jnp.where(b_pred == 1, m_pred, 0), jax.nn.sigmoid(b_logits)

        return predict

    def predict(self, images, kinematics):
        images = jnp.asarray(images)
        kinematics = jnp.asarray(kinematics)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data", None, None))
            images = jax.device_put(images, sh)
            kinematics = jax.device_put(kinematics, sh)
        return self._predict(images, kinematics)


def load_ensemble(
    runs_root: str,
    run_ids: List[str],
    setting: str,
    fold: str,
    mode: str = "soft_vote",
    mesh=None,
) -> EnsembleServer:
    """Build a server from stored runs (params.json + fold checkpoint)."""
    import json
    import os

    from ..tracking import RunTracker
    from ..train.checkpoint import load_best_checkpoint

    members = []
    for run_id in run_ids:
        run_dir = RunTracker.find_run(runs_root, run_id)
        with open(os.path.join(run_dir, "params.json")) as f:
            params = json.load(f)
        fields = {k: v for k, v in params.items()
                  if k in ExperimentConfig.__dataclass_fields__}
        cfg = ExperimentConfig(**fields)
        ckpt = load_best_checkpoint(
            os.path.join(run_dir, "checkpoints"), setting, fold,
            model_name=cfg.model_name,
        )
        members.append(WindowModelBundle(cfg, ckpt))
    return EnsembleServer(members, mode=mode, mesh=mesh)


class FrameModelServer:
    """Live frame-level inference for the frame families (TeCNo / TransSVNet
    / COG): standardize kinematics with the fold statistics, bucket-pad the
    trial, run the jitted eval step, return per-frame predictions and
    positive-class probabilities. One compilation per bucket length."""

    def __init__(self, cfg: ExperimentConfig, checkpoint: Dict,
                 stats: Dict = None, frozen=None):
        from ..train.engine import Experiment

        self.cfg = cfg
        self.stats = stats
        self.exp = Experiment(cfg)
        self._state = None
        self._checkpoint = checkpoint
        self._frozen = frozen

    def _ensure_state(self, batch):
        import jax

        if self._state is None:
            state = self.exp.init_state(jax.random.key(0), batch,
                                        frozen=self._frozen)
            self._state = state.replace(
                params=self._checkpoint["params"],
                batch_stats=self._checkpoint.get("batch_stats",
                                                 state.batch_stats),
                constants=self._checkpoint.get("constants", state.constants)
                if self._checkpoint.get("constants") else state.constants,
            )
        return self._state

    def predict_trial(self, images, kinematics):
        """images (T, 2048), kinematics (T, 26) raw -> (preds (T,), probs)."""
        import numpy as np

        from ..data.datasets import FrameTrial, frame_batch
        from ..data.labels import skill_one_hot

        kin = kinematics
        if self.stats is not None:
            kin = (kinematics - self.stats["kinematics"]["mean"]) / (
                self.stats["kinematics"]["std"]
            )
        T = len(kin)
        trial = FrameTrial(
            name="Needle_Passing_B000",
            images=np.asarray(images, np.float32),
            kinematics=np.asarray(kin, np.float32),
            g_labels=np.ones(T, np.int64),
            e_powerset=np.zeros((T, 7), np.int32),
            skill=skill_one_hot("Needle_Passing_B000", T),
        )
        batch = frame_batch(trial, self.cfg)
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
        if self.exp.family == "tsvn":
            batch["tecno_logits"] = np.zeros(
                (1, batch["labels"].shape[0], self.cfg.out_features),
                np.float32,
            )
        state = self._ensure_state(batch)
        m = self.exp.eval_step(state, batch)
        import numpy as _np

        return (_np.asarray(m["preds"])[:T], _np.asarray(m["probs"])[:T])
