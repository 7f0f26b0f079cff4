"""Headline benchmark, run on real TPU by the driver.

Measures the window-level inference path end-to-end on device (feature
extractor 2048->512->256->32 + multimodal concat + SimpleCNN head) at the
reference's batch size 512 — the configuration whose reference number is
1.04 ± 0.20 ms/window on Apple MPS (BASELINE.md, results.ipynb cell 2) —
and reports windows/sec/chip.

Timing methodology: every sub-benchmark is a single jitted
``lax.fori_loop`` whose carry feeds each iteration's input from the previous
iteration's output, so the runtime cannot coalesce or memoize repeated
identical dispatches (the axon remote-execution path dedups identical
async calls, which makes naive dispatch loops report impossible numbers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline = our windows/sec over the reference's (1 / 1.04 ms ≈ 962/s).
"extra" carries the COG frame rate (vs its 1.95 ms/frame baseline), the
end-to-end pixels->fused-preprocess->ResNet50->head rate, and the train-step
time.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ITERS = 20
# Best-of-N warm repeats: the axon relay has seconds-scale dispatch jitter,
# so a single sample can read tens of percent slow; the best of 3 is stable
# (round-1 VERDICT: recorded 317k windows/s vs the code's ~475k).
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# Wall-clock budget: remote TPU compiles dominate (~30-160 s per sub-bench);
# once the budget is spent, remaining sub-benchmarks are skipped so the
# headline JSON line is always printed (values default to -1 when skipped).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_T_START = time.time()

# Fraction-of-peak denominator: TPU v5e ≈ 197 bf16 TFLOP/s per chip
# (jax-ml.github.io/scaling-book hardware table); override for other chips.
PEAK_FLOPS = float(os.environ.get("TPU_PEAK_FLOPS", "1.97e14"))


def _budget_left() -> bool:
    return time.time() - _T_START < BUDGET_S


def _timed_loop(make_run, carry, n_lo: int = ITERS, n_hi: int = 5 * ITERS):
    """Marginal per-iteration time of the chained loop via a two-point
    slope: the same compiled program (dynamic trip count) is timed at
    n_lo and n_hi chained iterations and the slope
    (t_hi - t_lo) / (n_hi - n_lo) cancels the relay's fixed per-dispatch
    overhead (~100 ms/call on this tunnel — at ITERS=20 that inflated
    round-1 recorded step times by ~5 ms/iter). Pass a larger n_hi for
    millisecond-scale steps: the default 80-iteration span can land inside
    the relay's dispatch jitter and return a garbage (even negative)
    slope — BENCH_r04 prep saw tsvn read -0.0 at the default span."""
    import jax
    import jax.numpy as jnp

    run = make_run()
    lo = jnp.asarray(n_lo)
    hi = jnp.asarray(n_hi)
    carry = jax.block_until_ready(run(carry, lo))  # compile + warm
    best_lo = best_hi = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, lo))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, hi))
        best_hi = min(best_hi, time.perf_counter() - t0)
        if r + 1 < REPEATS and not _budget_left():
            break
    return (best_hi - best_lo) / (n_hi - n_lo)


def _loop_flops(make_run, carry):
    """HLO flops of ONE loop iteration via XLA cost analysis (-1 if the
    backend doesn't expose it). cost_analysis counts a while-loop body
    once regardless of trip count, so the program total IS the
    per-iteration figure."""
    import jax.numpy as jnp

    try:
        an = make_run().lower(carry, jnp.asarray(ITERS)).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", -1.0))
    except Exception:
        return -1.0


def _mfu(flops_per_iter: float, t_per_iter: float) -> float:
    if flops_per_iter <= 0 or t_per_iter <= 0:
        return -1.0
    return flops_per_iter / t_per_iter / PEAK_FLOPS


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.cli.common import enable_compilation_cache
    from med_tpu.config import ExperimentConfig
    from med_tpu.train.engine import Experiment

    # persistent XLA cache: repeated bench runs skip the relay's cold
    # compiles (measured 11.8 s -> 0.8 s for a scan program across processes)
    enable_compilation_cache()

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

    def infer(params, batch_stats, images, kinematics):
        feats = exp.fe.apply({"params": params["fe"]}, images)
        x = jnp.concatenate([feats, kinematics], axis=-1)
        return exp.model.apply(
            {"params": params["model"], "batch_stats": batch_stats["model"]},
            x, train=False,
        )

    def make_infer_run():
        @jax.jit
        def run(images, n):
            def body(i, im):
                logits = infer(state.params, state.batch_stats, im,
                               batch["kinematics"])
                # data dependency: next input depends on this output
                return im + 1e-12 * jnp.mean(logits)

            return jax.lax.fori_loop(0, n, body, images)

        return run

    t_infer = _timed_loop(make_infer_run, batch["images"])
    windows_per_sec = B / t_infer
    ms_per_window = t_infer / B * 1e3
    ref_windows_per_sec = 1.0 / 1.04e-3  # BASELINE.md multimodal CNN
    infer_flops = _loop_flops(make_infer_run, batch["images"])

    # ---- trace-derived window-inference MFU: device span of the SAME
    #      compiled loop from a jax.profiler capture, immune to the relay's
    #      wall-clock jitter (round-3 VERDICT item 5: the recorded MFU
    #      wobbled 0.80 -> 0.70 across rounds with only a drift explanation;
    #      this number pins it) ----
    window_infer_mfu_trace, window_infer_span_us = -1.0, -1.0
    if on_tpu and _budget_left():
        import shutil
        import tempfile

        from med_tpu.utils.profiling import trace_device_span_s

        TRACE_ITERS = 50
        logdir = tempfile.mkdtemp(prefix="benchtrace_")
        try:
            runner = make_infer_run()
            jax.block_until_ready(runner(batch["images"], jnp.asarray(5)))
            jax.profiler.start_trace(logdir)
            jax.block_until_ready(
                runner(batch["images"], jnp.asarray(TRACE_ITERS)))
            jax.profiler.stop_trace()
            span = trace_device_span_s(logdir)
        except Exception:
            span = -1.0
        finally:
            shutil.rmtree(logdir, ignore_errors=True)
        if span > 0:
            window_infer_span_us = span / TRACE_ITERS * 1e6
            window_infer_mfu_trace = _mfu(infer_flops, span / TRACE_ITERS)

    # ---- window train step (state carry is inherently data-dependent) ----
    t_train = -1.0
    if _budget_left():
        step = exp._make_step(train=True)

        def make_train_run():
            @jax.jit
            def run(s, n):
                return jax.lax.fori_loop(0, n, lambda i, c: step(c, batch)[0], s)

            return run

        t_train = _timed_loop(make_train_run,
                              exp.init_state(jax.random.key(7), batch))

    # ---- fused window RUN (the production training path): a full
    #      30-epoch fold — train scans + per-epoch eval + on-device best-
    #      checkpoint selection — as ONE device program ----
    from med_tpu.data.datasets import WindowFold
    from med_tpu.train.fused import FusedWindowRun

    Nf = 5120
    N_EPOCHS = 30
    powerset = np.zeros((Nf, 7), np.int32)
    powerset[: Nf // 2, 6] = 1
    powerset[Nf // 2 :, 0] = 1

    def _fold(n):
        return WindowFold(
            images=rng.normal(size=(n, W, 2048)).astype(np.float32),
            kinematics=rng.normal(size=(n, W, 26)).astype(np.float32),
            g_labels=np.ones((n, 1), np.int64),
            e_powerset=powerset[:n],
            subjects=np.asarray(["s"] * n, object),
        )

    t_run, t_epoch, fused_windows_per_sec = -1.0, -1.0, -1.0
    n_steps = -(-Nf // B)
    if _budget_left():
        runner = FusedWindowRun(exp, cfg, _fold(Nf), _fold(1024))
        fstate = exp.init_state(jax.random.key(9), batch)
        fstate, _, fouts = runner.run(fstate, 0, N_EPOCHS)  # compile + warm
        np.asarray(fouts[-1])
        t_run = float("inf")
        for r in range(REPEATS):
            t0 = time.perf_counter()
            fstate, _, fouts = runner.run(fstate, 1 + r, N_EPOCHS)
            np.asarray(fouts[-1])
            t_run = min(t_run, time.perf_counter() - t0)
            if not _budget_left():
                break
        t_epoch = t_run / N_EPOCHS
        fused_windows_per_sec = Nf / t_epoch

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
    cog_params = exp_cog.params_tree(cog_state.params)

    def make_cog_run():
        @jax.jit
        def run(images, n):
            def body(i, im):
                feats = exp_cog.fe.apply({"params": cog_params["fe"]}, im)
                x = jnp.concatenate([feats, fbatch["kinematics"]], axis=-1)
                out_list, _ = exp_cog.model.apply(
                    {"params": cog_params["model"],
                     "constants": cog_state.constants["model"]},
                    x, train=False,
                )
                return im + 1e-12 * jnp.mean(out_list[0])

            return jax.lax.fori_loop(0, n, body, images)

        return run

    ref_cog_frames_per_sec = 1.0 / 1.95e-3  # BASELINE.md COG ms/frame
    t_cog, cog_frames_per_sec, cog_flops = -1.0, -1.0, -1.0
    if _budget_left():
        t_cog = _timed_loop(make_cog_run, fbatch["images"])
        cog_frames_per_sec = T / t_cog
        cog_flops = _loop_flops(make_cog_run, fbatch["images"])

    # ---- COG train step (fused Pallas TCN stacks + attention custom VJP;
    #      round-1 reference point: 33.8 ms at T=1024) ----
    t_cog_train, cog_train_flops = -1.0, -1.0
    if _budget_left():
        cog_step = exp_cog._make_step(train=True)

        def make_cog_train_run():
            @jax.jit
            def run(s, n):
                return jax.lax.fori_loop(
                    0, n, lambda i, c: cog_step(c, fbatch)[0], s)

            return run

        t_cog_train = _timed_loop(make_cog_train_run,
                                  exp_cog.init_state(jax.random.key(3), fbatch))
        cog_train_flops = _loop_flops(make_cog_train_run,
                                      exp_cog.init_state(jax.random.key(3), fbatch))

    # ---- TransSVNet train step (frozen TeCNo -> transformer refiner,
    #      T=1024; the collapsed class-width-bottleneck MHA) ----
    t_tsvn = -1.0
    if _budget_left():
        import functools

        cfg_tsvn = ExperimentConfig(
            model_name="TransSVNet", dataset_type="frame",
            data_type="multimodal", out_features=2, batch_size=1,
        )
        exp_tsvn = Experiment(cfg_tsvn)
        tp = jax.jit(lambda r, x: exp_tsvn.frozen_tecno.init(
            r, x, train=False))(
            {"params": jax.random.key(5)},
            jnp.zeros((1, 256, cfg_tsvn.in_features())))["params"]
        tbatch = dict(fbatch)
        tbatch["labels"] = jnp.zeros(T, jnp.int32)
        # init-time model-input probe (engine._model_inputs)
        tbatch["tecno_logits"] = jnp.zeros((1, T, 2), jnp.float32)
        tsvn_state = jax.jit(functools.partial(
            exp_tsvn.init_state, frozen={"tecno_params": tp}))(
            jax.random.key(4), tbatch)
        tsvn_step = exp_tsvn._make_step(train=True)

        def make_tsvn_run():
            @jax.jit
            def run(s, n):
                return jax.lax.fori_loop(
                    0, n, lambda i, c: tsvn_step(c, tbatch)[0], s)

            return run

        t_tsvn = _timed_loop(make_tsvn_run, tsvn_state, n_lo=20, n_hi=220)

    # ---- end-to-end pixels -> fused preprocess -> ResNet-50 -> features
    #      -> FeatureExtractor -> window head (the BASELINE.json pipeline) ----
    from med_tpu.data.preprocessing import jax_preprocess_frames
    from med_tpu.models.resnet import ResNet50

    # bf16 trunk on TPU: params stay fp32, compute in bfloat16 (MXU-native)
    trunk = ResNet50(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    NB = 128  # frames per step
    frames0 = jnp.asarray(rng.normal(size=(NB, 240, 320, 3)) * 60 + 127,
                          jnp.float32)
    tv = trunk.init({"params": jax.random.key(2)},
                    jnp.zeros((1, 224, 224, 3)), train=False)

    def make_e2e_run():
        @jax.jit
        def run(frames, n):
            def body(i, fr):
                pix = jax_preprocess_frames(fr)
                feats = trunk.apply(tv, pix, train=False)  # (NB, 2048)
                n_win = NB // 10
                w = feats[: n_win * 10].reshape(n_win, 10, 2048)
                fe_out = exp.fe.apply({"params": state.params["fe"]}, w)
                x = jnp.concatenate(
                    [fe_out, batch["kinematics"][:n_win]], axis=-1
                )
                logits = exp.model.apply(
                    {"params": state.params["model"],
                     "batch_stats": state.batch_stats["model"]},
                    x, train=False,
                )
                return fr + 1e-9 * jnp.mean(logits)

            return jax.lax.fori_loop(0, n, body, frames)

        return run

    t_e2e, e2e_frames_per_sec, e2e_vs_baseline = -1.0, -1.0, -1.0
    if _budget_left():
        t_e2e = _timed_loop(make_e2e_run, frames0)
        e2e_frames_per_sec = NB / t_e2e
        e2e_vs_baseline = e2e_frames_per_sec / ref_cog_frames_per_sec

    # ---- ResNet-50 fine-tune TRAIN step (reference resnet_finetuning.ipynb
    #      cell 6-7: batch 32, BCE on the binary error label, Adam; our
    #      driver's on-device augment + normalize included, bf16 trunk on
    #      TPU). BASELINE.md's "ResNet fine-tune" row is the one reference
    #      training path without a recorded speedup until now. ----
    t_rft, rft_flops = -1.0, -1.0
    if _budget_left():
        import functools

        import optax

        from med_tpu.data.augment import augment_batch
        from med_tpu.models.resnet import ResNetClassifier
        from med_tpu.train.losses import bce_with_logits

        clf = ResNetClassifier(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        RB = 32
        rimgs = jnp.asarray(rng.normal(size=(RB, 224, 224, 3)) * 60 + 127,
                            jnp.float32)
        rlabels = jnp.asarray(rng.integers(0, 2, RB), jnp.float32)
        rvars = jax.jit(functools.partial(clf.init, train=False))(
            {"params": jax.random.key(6)}, jnp.zeros((1, 224, 224, 3)))
        rtx = optax.adam(5e-4)

        def make_rft_run():
            @jax.jit
            def run(carry, n):
                def body(i, c):
                    params, stats, opt = c
                    key = jax.random.fold_in(jax.random.key(11), i)
                    imgs = augment_batch(
                        key, rimgs,
                        normalize=(jnp.full((3,), 0.45), jnp.full((3,), 0.22)))

                    def loss_fn(p):
                        logits, mut = clf.apply(
                            {"params": p, "batch_stats": stats},
                            imgs, train=True,
                            mutable=["batch_stats"],
                        )
                        return (bce_with_logits(logits, rlabels),
                                mut["batch_stats"])

                    (_, new_stats), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    updates, opt2 = rtx.update(grads, opt)
                    return (optax.apply_updates(params, updates),
                            new_stats, opt2)

                return jax.lax.fori_loop(0, n, body, carry)

            return run

        rcarry = (rvars["params"], rvars["batch_stats"],
                  rtx.init(rvars["params"]))
        t_rft = _timed_loop(make_rft_run, rcarry)
        rft_flops = _loop_flops(make_rft_run, rcarry)

    result = {
        "metric": "window inference throughput (multimodal CNN, batch 512, FE+head on device)",
        "value": round(windows_per_sec, 1),
        "unit": "windows/sec/chip",
        "vs_baseline": round(windows_per_sec / ref_windows_per_sec, 2),
        "extra": {
            "backend": jax.default_backend(),
            "ms_per_window": round(ms_per_window, 6),
            "ref_ms_per_window": 1.04,
            "window_train_step_ms": round(t_train * 1e3, 3),
            "fused_run_epochs": N_EPOCHS,
            "fused_run_total_ms": round(t_run * 1e3, 3),
            "fused_epoch_ms": round(t_epoch * 1e3, 3),
            "fused_epoch_steps": n_steps,
            "fused_train_windows_per_sec": round(fused_windows_per_sec, 1),
            "cog_frames_per_sec": round(cog_frames_per_sec, 1),
            "cog_vs_baseline": round(cog_frames_per_sec / ref_cog_frames_per_sec, 2),
            "cog_ms_per_frame": round(t_cog / T * 1e3, 6),
            "ref_cog_ms_per_frame": 1.95,
            "cog_train_step_ms": round(t_cog_train * 1e3, 3),
            "tsvn_train_step_ms": round(t_tsvn * 1e3, 3),
            "cog_train_frames_per_sec": round(T / t_cog_train, 1) if t_cog_train > 0 else -1.0,
            "cog_train_mfu": round(_mfu(cog_train_flops, t_cog_train), 4),
            "e2e_pixels_resnet_head_frames_per_sec": round(e2e_frames_per_sec, 1),
            "e2e_vs_baseline": round(e2e_vs_baseline, 2),
            "e2e_trunk_dtype": str(trunk.dtype.__name__ if hasattr(trunk.dtype, "__name__") else trunk.dtype),
            "resnet_train_step_ms": round(t_rft * 1e3, 3),
            "resnet_train_frames_per_sec": round(32 / t_rft, 1) if t_rft > 0 else -1.0,
            "resnet_train_mfu": round(_mfu(rft_flops, t_rft), 4),
            # fraction of chip peak (v5e bf16 ≈ 197 TFLOP/s unless overridden)
            "window_infer_mfu": round(_mfu(infer_flops, t_infer), 4),
            "window_infer_mfu_trace": round(window_infer_mfu_trace, 4),
            "window_infer_span_us_trace": round(window_infer_span_us, 2),
            "cog_infer_mfu": round(_mfu(cog_flops, t_cog), 4),
            "peak_flops_assumed": PEAK_FLOPS,
            "timing": f"two-point slope, best of {REPEATS}, fori_loop({ITERS}) vs fori_loop({5*ITERS})",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
