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
import numpy as np

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
        self.qfe = None  # int8 PTQ FeatureExtractor (quantize_fe())

    def quantize_fe(self, calib_images) -> None:
        """Swap the member's FeatureExtractor for the int8 PTQ path
        (ops/quant.py::quantize_fe), calibrated on a representative
        (B, W, 2048) feature batch — serving-only, measured 1.30x on the
        window-inference headline shape (TPU v5e, batch 512) at ~2 %
        max-relative logits drift. No-op for kinematics-only members."""
        if self.fe is not None and self.cfg.data_type != "kinematics":
            from ..ops.quant import quantize_fe

            self.qfe = quantize_fe(self.params["fe"], calib_images)

    def logits(self, images, kinematics):
        cfg = self.cfg
        if cfg.data_type == "kinematics":
            x = kinematics
        else:
            feats = images
            if self.qfe is not None:
                from ..ops.quant import fe_int8_apply

                feats = fe_int8_apply(self.qfe, images)
            elif self.fe is not None:
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
    int8_fe_calib=None,
) -> EnsembleServer:
    """Build a server from stored runs (params.json + fold checkpoint).

    ``int8_fe_calib``: optional (B, W, 2048) feature batch — when given,
    every member with a FeatureExtractor serves through the int8 PTQ FE
    calibrated on it (WindowModelBundle.quantize_fe)."""
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
        member = WindowModelBundle(cfg, ckpt)
        if int8_fe_calib is not None:
            member.quantize_fe(int8_fe_calib)
        members.append(member)
    return EnsembleServer(members, mode=mode, mesh=mesh)


class PixelFrontEnd:
    """Raw frames -> pooled ResNet-50 trunk features, live.

    Completes the pixels -> prediction serving chain: the reference exports
    2048-d features offline (``preprocessing_utils.py:734-823``) before any
    window model ever runs; here the fine-tuned trunk serves in-process
    ahead of the ensemble. Two trunk modes:

    - bf16 (default): :class:`models.resnet.ResNet50` at dtype bfloat16 —
      the documented single-chip e2e floor (~13.3k frames/s on v5e);
    - ``int8=True``: the PTQ serving trunk (ops/quant.py) calibrated from
      caller-supplied frames — measured 1.37x past the bf16 floor
      (18.6k frames/s, cosine 0.99986 vs fp32 at the e2e shape).

    Preprocessing: with per-fold pixel channel stats (``mean``/``std`` —
    what ``cli/resnet_finetune.py`` stores in the checkpoint meta) the
    driver's /255 + standardize runs on device; without them the ImageNet
    resize-240/crop-224 graph (``jax_preprocess_frames``) is used. Batches
    are right-padded to ``batch_size`` so every call hits ONE compiled
    program regardless of trial length.
    """

    def __init__(self, trunk_params, trunk_stats, *, mean=None, std=None,
                 int8=False, calib_frames=None, dtype=jnp.bfloat16,
                 stage_sizes=(3, 4, 6, 3), width=64, batch_size=128,
                 mesh=None):
        self.batch_size = int(batch_size)
        self.mesh = mesh

        if mean is not None:
            mean_j = jnp.asarray(mean, jnp.float32)
            std_j = jnp.asarray(std, jnp.float32)

            def preprocess(x):
                return (x.astype(jnp.float32) / 255.0 - mean_j) / std_j
        else:
            from ..data.preprocessing import jax_preprocess_frames

            preprocess = jax_preprocess_frames

        if int8:
            if calib_frames is None:
                raise ValueError("int8=True needs calib_frames (one "
                                 "representative raw-frame batch)")
            from ..ops.quant import (quantize_resnet50_trunk,
                                     resnet50_int8_apply)

            qt = quantize_resnet50_trunk(
                {"params": trunk_params, "batch_stats": trunk_stats},
                np.asarray(jax.jit(preprocess)(
                    jnp.asarray(calib_frames, jnp.float32))),
                stage_sizes=stage_sizes,
            )
            self._features = jax.jit(lambda fr: resnet50_int8_apply(
                qt, preprocess(fr), stage_sizes=tuple(stage_sizes)))
        else:
            from ..models.resnet import ResNet50

            model = ResNet50(tuple(stage_sizes), width, dtype)
            variables = {"params": trunk_params, "batch_stats": trunk_stats}
            self._features = jax.jit(lambda fr: model.apply(
                variables, preprocess(fr), train=False))

    @classmethod
    def from_checkpoint(cls, path, **kw):
        """Build from a ``cli/resnet_finetune.py`` checkpoint
        (``resnet50_<fold>.npz`` + ``.json`` meta with the fold's pixel
        channel mean/std)."""
        import json
        import os

        from ..train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        # save_checkpoint writes the meta next to the .npz: <path>.json
        # whether or not <path> already carried the extension
        for meta_path in (path + ".json", path + ".npz.json"):
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                kw.setdefault("mean", meta.get("mean"))
                kw.setdefault("std", meta.get("std"))
                break
        return cls(ckpt["params"]["trunk"], ckpt["batch_stats"]["trunk"],
                   **kw)

    def features(self, frames):
        """(N, H, W, 3) uint8/float raw frames -> (N, F) fp32 features.
        Any N: chunks of ``batch_size``, last chunk zero-padded (sliced
        back) so the jitted program compiles once."""
        frames = np.asarray(frames)
        bs = self.batch_size
        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
        out = []
        for s in range(0, len(frames), bs):
            chunk = frames[s:s + bs]
            n = len(chunk)
            if n < bs:
                chunk = np.pad(chunk, ((0, bs - n),) + ((0, 0),) * 3)
            x = jnp.asarray(chunk, jnp.float32)
            if sharding is not None:
                x = jax.device_put(x, sharding)
            out.append(np.asarray(self._features(x))[:n])
        return np.concatenate(out, axis=0)


def predict_trial_from_pixels(frontend: "PixelFrontEnd",
                              server: "EnsembleServer",
                              frames, kinematics, g_labels,
                              cfg, stats):
    """Live pixels -> prediction for one trial: trunk features
    (:class:`PixelFrontEnd`) -> reference windowing (window_scan over the
    trial's gesture vector, dataset_utils.py:214-239) -> fold
    standardization -> fused ensemble (:class:`EnsembleServer`).

    Returns ``(starts, preds, probs)`` — window start frame indices and the
    ensemble outputs per emitted window. Mirrors exactly what the offline
    chain (feature export + build_window_fold + stored-prob ensembling)
    produces for the same trial, live.
    """
    from ..data.datasets import standardize
    from ..data.windowing import window_scan

    feats = frontend.features(frames)
    kin = np.asarray(kinematics, np.float32)
    starts = window_scan(np.asarray(g_labels), cfg.window_size, cfg.stride)
    if starts.size == 0:
        return starts, np.empty(0, np.int32), np.empty(0, np.float32)
    gather = starts[:, None] + np.arange(cfg.window_size)[None, :]
    iw = standardize(feats[gather], stats["image"])
    kw = standardize(kin[gather], stats["kinematics"])
    n = len(starts)
    if server.mesh is not None:  # pad to the data-axis multiple for DP
        padn = (-n) % int(server.mesh.shape["data"])
        if padn:
            iw = np.pad(iw, ((0, padn), (0, 0), (0, 0)))
            kw = np.pad(kw, ((0, padn), (0, 0), (0, 0)))
    preds, probs = server.predict(iw, kw)
    return starts, np.asarray(preds)[:n], np.asarray(probs)[:n]


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

    def predict_trial_from_pixels(self, frontend: "PixelFrontEnd",
                                  frames, kinematics):
        """Live frame-family serving from RAW frames: the trunk front-end
        (bf16 or int8) produces the (T, 2048) features in-process, then the
        standard trial path runs — the full reference pipeline (feature
        export + frame model) with no offline step."""
        return self.predict_trial(frontend.features(frames), kinematics)

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
