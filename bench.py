"""Headline benchmark, run on real TPU by the driver.

Measures the window-level inference path end-to-end on device (feature
extractor 2048->512->256->32 + multimodal concat + SimpleCNN head) at the
reference's batch size 512 — the configuration whose reference number is
1.04 ± 0.20 ms/window on Apple MPS (BASELINE.md, results.ipynb cell 2) —
and reports windows/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is our windows/sec over the reference's (1 / 1.04 ms ≈ 962/s).
Extra sub-benchmarks (COG frame inference vs its 1.95 ms/frame baseline,
train-step time) are included in the "extra" field for tracking.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, warmup: int = 3, iters: int = 20) -> float:
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.config import ExperimentConfig
    from med_tpu.train.engine import Experiment

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    # ---- headline: window inference (multimodal SimpleCNN, batch 512) ----
    cfg = ExperimentConfig(model_name="SimpleCNN", data_type="multimodal",
                           use_pallas=on_tpu)
    exp = Experiment(cfg)
    B, W = 512, cfg.window_size
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, W, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(B, W, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, B)),
        "mask": jnp.ones(B, jnp.float32),
    }
    state = exp.init_state(jax.random.key(0), batch)

    @jax.jit
    def infer(params, batch_stats, images, kinematics):
        feats = exp.fe.apply({"params": params["fe"]}, images)
        x = jnp.concatenate([feats, kinematics], axis=-1)
        return exp.model.apply(
            {"params": params["model"], "batch_stats": batch_stats["model"]},
            x, train=False,
        )

    t_infer = _timeit(
        infer, state.params, state.batch_stats, batch["images"], batch["kinematics"]
    )
    windows_per_sec = B / t_infer
    ms_per_window = t_infer / B * 1e3
    ref_windows_per_sec = 1.0 / 1.04e-3  # BASELINE.md multimodal CNN

    # ---- window train step ----
    t_train = _timeit(lambda s, b: exp.train_step(s, b)[1]["loss"], state, batch,
                      warmup=2, iters=10)

    # ---- COG frame inference (multimodal, T=1024) ----
    cfg_cog = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="multimodal",
        out_features=2, batch_size=1, mstcn_stages=8, use_pallas=on_tpu,
    )
    exp_cog = Experiment(cfg_cog)
    T = 1024
    fbatch = {
        "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)), jnp.float32),
        "labels": jnp.zeros(T, jnp.int32),
        "mask": jnp.ones(T, jnp.float32),
        "true_len": jnp.asarray(T, jnp.int32),
    }
    cog_state = exp_cog.init_state(jax.random.key(1), fbatch)

    @jax.jit
    def cog_infer(params, constants, images, kinematics):
        feats = exp_cog.fe.apply({"params": params["fe"]}, images)
        x = jnp.concatenate([feats, kinematics], axis=-1)
        out_list, _ = exp_cog.model.apply(
            {"params": params["model"], "constants": constants["model"]},
            x, train=False,
        )
        return out_list[0]

    t_cog = _timeit(
        cog_infer, cog_state.params, cog_state.constants,
        fbatch["images"], fbatch["kinematics"], warmup=2, iters=10,
    )
    cog_frames_per_sec = T / t_cog
    ref_cog_frames_per_sec = 1.0 / 1.95e-3  # BASELINE.md COG ms/frame

    result = {
        "metric": "window inference throughput (multimodal CNN, batch 512, FE+head on device)",
        "value": round(windows_per_sec, 1),
        "unit": "windows/sec/chip",
        "vs_baseline": round(windows_per_sec / ref_windows_per_sec, 2),
        "extra": {
            "backend": jax.default_backend(),
            "ms_per_window": round(ms_per_window, 5),
            "ref_ms_per_window": 1.04,
            "window_train_step_ms": round(t_train * 1e3, 3),
            "cog_frames_per_sec": round(cog_frames_per_sec, 1),
            "cog_vs_baseline": round(cog_frames_per_sec / ref_cog_frames_per_sec, 2),
            "cog_ms_per_frame": round(t_cog / T * 1e3, 5),
            "ref_cog_ms_per_frame": 1.95,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
