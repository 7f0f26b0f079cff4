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

Measurement integrity (round-5 VERDICT item 1 — BENCH_r04 recorded a
NEGATIVE headline because the default 80-iteration two-point span landed
inside the relay's dispatch jitter):

- every two-point slope is GUARDED: if the slope is <= 0 or the measured
  span is smaller than the jitter floor, the span is widened (same compiled
  program, dynamic trip count) and re-measured;
- if widening still fails, the value falls back to the device span of a
  jax.profiler trace of the same loop (wall-clock-jitter-immune), and as a
  last resort to total-time/n at the widest span (a positive upper bound);
- sub-benches run in PRIORITY order with per-entry budget gates so a late
  entry can't be starved the way `resnet_train_step_ms` was in r04;
- the JSON's ``timing_methods`` records which path produced each number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline = our windows/sec over the reference's (1 / 1.04 ms ≈ 962/s).
"extra" carries the COG frame rate (vs its 1.95 ms/frame baseline), the
end-to-end pixels->fused-preprocess->ResNet50->head rate, the train-step
times (ResNet fine-tune, COG at batch 1 and trial_batch=8), and the int8
serving-trunk A/B.
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

# Minimum wall-clock width of an accepted two-point span: the relay's
# call-to-call jitter is a few ms, so a span an order of magnitude above
# it keeps the slope's sign (and first digit) trustworthy.
MIN_SPAN_S = float(os.environ.get("BENCH_MIN_SPAN_S", "0.05"))
MAX_HI = 4000  # widest trip count the widening schedule may request

# method provenance per recorded metric, emitted as extra["timing_methods"]
_METHODS: dict = {}


def _budget_left(reserve_s: float = 0.0) -> bool:
    return time.time() - _T_START < BUDGET_S - reserve_s


def _trace_iter_time(run, carry, est_iter_s: float) -> float:
    """Device span per iteration from a jax.profiler capture of the SAME
    compiled loop — immune to relay wall-clock jitter. Returns -1 if no
    device plane is found (e.g. CPU backend)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from med_tpu.utils.profiling import trace_device_span_s

    # Keep the trace short: r04's 50-iteration capture measured a clean
    # 89 us/iter device span, while a 2000-iteration capture of the same
    # loop read 5x inflated (long busiest-line spans accumulate non-compute
    # events); 8-64 iterations is plenty since the span already excludes
    # dispatch overhead.
    est = max(est_iter_s, 1e-6)
    n = int(min(max(0.05 / est, 8), 64))
    logdir = tempfile.mkdtemp(prefix="benchtrace_")
    try:
        # Warm OUTSIDE the capture: a fresh jit wrapper compiling inside
        # the trace puts XLA autotuning executions on the device plane,
        # and first-event->last-event span then covers the whole compile
        # window (a 2026-08-20 run read 9.13 ms/iter for the 89 us loop,
        # mfu_trace 0.0069). The warm call's output feeds the traced call
        # so the relay can't memoize the traced dispatch.
        carry = jax.block_until_ready(run(carry, jnp.asarray(n)))
        jax.profiler.start_trace(logdir)
        jax.block_until_ready(run(carry, jnp.asarray(n)))
        jax.profiler.stop_trace()
        span = trace_device_span_s(logdir)
    except Exception:
        return -1.0
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    if span <= 0:
        return -1.0
    t = span / n
    # Plausibility gate: the device span physically cannot exceed the
    # dispatch-inclusive wall-clock estimate (it may be far BELOW it when
    # est is the total/n upper bound, so only the high side is gated).
    # Never report garbage.
    if est_iter_s > 0 and t > est_iter_s * 3:
        return -1.0
    return t


def _timed_loop(make_run, carry, n_lo: int = ITERS, n_hi: int = 5 * ITERS,
                name: str = "?"):
    """Marginal per-iteration time of the chained loop via a GUARDED
    two-point slope: the same compiled program (dynamic trip count) is
    timed at n_lo and n_hi chained iterations and the slope
    (t_hi - t_lo) / (n_hi - n_lo) cancels the relay's fixed per-dispatch
    overhead (~100 ms/call on this tunnel — at ITERS=20 that inflated
    round-1 recorded step times by ~5 ms/iter).

    Guard (BENCH_r04 recorded a negative headline): a slope is accepted
    only if it is positive AND the span (t_hi - t_lo) is at least
    MIN_SPAN_S; otherwise n_hi widens (targeting ~0.5 s of marginal work)
    and the measurement repeats. If widening can't produce a valid slope,
    fall back to the trace-derived device span, then to total/n at the
    widest span. Never returns a non-positive number."""
    import jax
    import jax.numpy as jnp

    run = make_run()
    carry = jax.block_until_ready(run(carry, jnp.asarray(n_lo)))  # compile

    best_hi_overall, n_hi_overall = float("inf"), n_hi
    for attempt in range(3):
        lo, hi = jnp.asarray(n_lo), jnp.asarray(n_hi)
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
        if best_hi / n_hi < best_hi_overall / n_hi_overall:
            best_hi_overall, n_hi_overall = best_hi, n_hi
        slope = (best_hi - best_lo) / (n_hi - n_lo)
        if slope > 0 and (best_hi - best_lo) >= MIN_SPAN_S:
            _METHODS[name] = f"slope({n_lo},{n_hi})"
            return slope
        # widen: aim the marginal segment at ~0.5 s of device work
        est = max(best_hi / n_hi, 1e-7)
        wider = int(min(max(0.5 / est, 2 * n_hi), MAX_HI))
        if wider <= n_hi or not _budget_left():
            break
        n_hi = wider

    t = _trace_iter_time(run, carry, best_hi_overall / n_hi_overall)
    if t > 0:
        _METHODS[name] = "trace-span"
        return t
    _METHODS[name] = f"upper-bound(total/{n_hi_overall})"
    return best_hi_overall / n_hi_overall


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
    import contextlib
    import functools

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

    @contextlib.contextmanager
    def guard(name):
        """A sub-bench failure (compile OOM, relay hiccup, code bug) records
        an error note and NEVER kills the run: the headline JSON must print
        (the r05-prep tb8 VMEM OOM aborted a whole bench with no output)."""
        try:
            yield
        except Exception as e:  # pragma: no cover - depends on backend
            _METHODS[name + "!error"] = f"{type(e).__name__}: {str(e)[:160]}"

    # shape constants + result defaults (every figure records -1 when its
    # sub-bench is skipped by the budget or fails)
    B, T, NB, TB, N_EPOCHS = 512, 1024, 128, 8, 30
    Nf = 5120
    n_steps = -(-Nf // B)
    ref_windows_per_sec = 1.0 / 1.04e-3   # BASELINE.md multimodal CNN
    ref_cog_frames_per_sec = 1.0 / 1.95e-3  # BASELINE.md COG ms/frame
    windows_per_sec = ms_per_window = infer_flops = -1.0
    window_infer_mfu_trace = window_infer_span_us = -1.0
    t_infer = t_train = t_run = t_epoch = fused_windows_per_sec = -1.0
    t_cog = cog_frames_per_sec = cog_flops = -1.0
    t_cog_train = cog_train_flops = -1.0
    t_cog_tb = cog_tb_flops = -1.0
    t_tsvn = t_e2e = e2e_frames_per_sec = e2e_vs_baseline = -1.0
    t_i8 = i8_cos_mean = -1.0
    t_i8w = t_i8s = -1.0
    t_rft = rft_flops = -1.0
    trunk_dtype = "bfloat16" if on_tpu else "float32"

    # =====================================================================
    # priority 1 — headline: window inference (multimodal SimpleCNN, b=512)
    # =====================================================================
    exp = state = batch = None
    make_infer_run = None
    with guard("window_infer"):
        cfg = ExperimentConfig(model_name="SimpleCNN", data_type="multimodal",
                               use_pallas=on_tpu)
        exp = Experiment(cfg)
        W = cfg.window_size
        batch = {
            "images": jnp.asarray(rng.normal(size=(B, W, 2048)), jnp.float32),
            "kinematics": jnp.asarray(rng.normal(size=(B, W, 26)),
                                      jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 2, B)),
            "mask": jnp.ones(B, jnp.float32),
        }
        state = exp.init_state(jax.random.key(0), batch)

        def infer(params, batch_stats, images, kinematics):
            feats = exp.fe.apply({"params": params["fe"]}, images)
            x = jnp.concatenate([feats, kinematics], axis=-1)
            return exp.model.apply(
                {"params": params["model"],
                 "batch_stats": batch_stats["model"]},
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

        # ~90 us/iter device-true (r04 trace): start the span at 1000 iters
        # so the marginal segment is ~0.1 s, well above relay jitter.
        t_infer = _timed_loop(make_infer_run, batch["images"], n_hi=1000,
                              name="window_infer")
        windows_per_sec = B / t_infer
        ms_per_window = t_infer / B * 1e3
        infer_flops = _loop_flops(make_infer_run, batch["images"])

    # trace-derived window-inference MFU: device span of the SAME compiled
    # loop from a jax.profiler capture (r04: 0.7044 at 89.12 us/512 windows)
    if on_tpu and make_infer_run is not None and _budget_left():
        with guard("window_infer_trace"):
            t_span = _trace_iter_time(make_infer_run(), batch["images"],
                                      t_infer)
            if t_span > 0:
                window_infer_span_us = t_span * 1e6
                window_infer_mfu_trace = _mfu(infer_flops, t_span)

    # =====================================================================
    # priority 1.5 — int8 PTQ FeatureExtractor on the SAME headline shape
    # (serving-only extra, eval/serving.py::WindowModelBundle.quantize_fe):
    # the bf16 path is MXU-bound at ~0.70 MFU, the s8 path has 2x the peak;
    # the win is bounded by the 42 MB f32 input read (probe: 1.30x).
    # =====================================================================
    if on_tpu and exp is not None and _budget_left():
        with guard("int8_window"):
            from med_tpu.ops.quant import fe_int8_apply, quantize_fe

            qfe = quantize_fe(state.params["fe"],
                              np.asarray(batch["images"][:32]))

            def make_i8w_run():
                @jax.jit
                def run(images, n):
                    def body(i, im):
                        logits = infer_int8(im)
                        return im + 1e-12 * jnp.mean(logits)

                    return jax.lax.fori_loop(0, n, body, images)

                def infer_int8(im):
                    feats = fe_int8_apply(qfe, im)
                    x = jnp.concatenate([feats, batch["kinematics"]],
                                        axis=-1)
                    return exp.model.apply(
                        {"params": state.params["model"],
                         "batch_stats": state.batch_stats["model"]},
                        x, train=False,
                    )

                return run

            t_i8w = _timed_loop(make_i8w_run, batch["images"], n_hi=1000,
                                name="int8_window")

    if on_tpu and exp is not None and t_i8w > 0 and _budget_left():
        with guard("int8_window_store"):
            from med_tpu.ops.quant import quantize_fe_input

            def make_i8s_run():
                """int8 FEATURE-STORE serving: pre-quantized windows drop
                the dominant input read 4x (42 -> 10.5 MB/step); arithmetic
                bit-identical to the fp32-input int8 path (pinned in
                tests/test_quant.py)."""
                @jax.jit
                def run(imq, n):
                    def body(i, q):
                        feats = fe_int8_apply(qfe, q)
                        x = jnp.concatenate(
                            [feats, batch["kinematics"]], axis=-1)
                        logits = exp.model.apply(
                            {"params": state.params["model"],
                             "batch_stats": state.batch_stats["model"]},
                            x, train=False,
                        )
                        bit = (jnp.sum(logits) > 0).astype(jnp.int8)
                        return jnp.bitwise_xor(q, bit)

                    return jax.lax.fori_loop(0, n, body, imq)

                return run

            t_i8s = _timed_loop(make_i8s_run,
                                quantize_fe_input(qfe, batch["images"]),
                                n_hi=1000, name="int8_window_store")

    # =====================================================================
    # priority 2 — ResNet-50 fine-tune TRAIN step (reference
    # resnet_finetuning.ipynb cell 6-7: batch 32, BCE on the binary error
    # label, Adam; our driver's on-device augment + normalize included,
    # bf16 trunk on TPU). r04's BENCH entry was starved by the budget;
    # it now runs SECOND.
    # =====================================================================
    if _budget_left():
        with guard("resnet_train"):
            import optax

            from med_tpu.data.augment import augment_batch
            from med_tpu.models.resnet import ResNetClassifier
            from med_tpu.train.losses import bce_with_logits

            clf = ResNetClassifier(
                dtype=jnp.bfloat16 if on_tpu else jnp.float32)
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
                            normalize=(jnp.full((3,), 0.45),
                                       jnp.full((3,), 0.22)))

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
            t_rft = _timed_loop(make_rft_run, rcarry, name="resnet_train")
            rft_flops = _loop_flops(make_rft_run, rcarry)

    # =====================================================================
    # priority 3 — COG train step, batch-1 parity config (fused Pallas TCN
    # stacks + attention custom VJP; round-1 reference point: 33.8 ms at
    # T=1024; r04 device-span floor analysis: ~1.8 ms)
    # =====================================================================
    cfg_cog = exp_cog = cog_state = cog_params = fbatch = None
    with guard("cog_setup"):
        cfg_cog = ExperimentConfig(
            model_name="COG", dataset_type="frame", data_type="multimodal",
            out_features=2, batch_size=1, mstcn_stages=8, use_pallas=on_tpu,
        )
        exp_cog = Experiment(cfg_cog)
        fbatch = {
            "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
            "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)),
                                      jnp.float32),
            "labels": jnp.zeros(T, jnp.int32),
            "mask": jnp.ones(T, jnp.float32),
            "true_len": jnp.asarray(T, jnp.int32),
        }
        # jitted init: eager COG init dispatches each traced op separately
        # over the relay (minutes, CLAUDE.md) — one compiled program instead
        cog_init = jax.jit(lambda r: exp_cog.init_state(r, fbatch))
        cog_state = cog_init(jax.random.key(1))
        cog_params = exp_cog.params_tree(cog_state.params)

    if exp_cog is not None and _budget_left():
        with guard("cog_train"):
            cog_step = exp_cog._make_step(train=True)

            def make_cog_train_run():
                @jax.jit
                def run(s, n):
                    return jax.lax.fori_loop(
                        0, n, lambda i, c: cog_step(c, fbatch)[0], s)

                return run

            t_cog_train = _timed_loop(
                make_cog_train_run, cog_init(jax.random.key(3)),
                name="cog_train")
            cog_train_flops = _loop_flops(
                make_cog_train_run, cog_init(jax.random.key(3)))

    # =====================================================================
    # priority 4 — COG train step at trial_batch=8: the THROUGHPUT regime
    # (VERDICT r04 item 5). The reference trains frame models at
    # batch_size=1 (train_frame.ipynb cell 1); the framework's vmapped
    # trial axis amortizes the ~1.8 ms latency floor across 8 trials.
    # =====================================================================
    if cfg_cog is not None and _budget_left():
        with guard("cog_train_tb8"):
            exp_tb = Experiment(cfg_cog.replace(trial_batch=TB))
            tb_state = jax.jit(lambda r: exp_tb.init_state(r, fbatch))(
                jax.random.key(3))
            gbatch = {k: jnp.stack([v] * TB) for k, v in fbatch.items()}
            gbatch["trial_weight"] = jnp.ones(TB, jnp.float32)
            tb_step = exp_tb._make_step(train=True)

            def make_cog_tb_run():
                @jax.jit
                def run(s, n):
                    return jax.lax.fori_loop(
                        0, n, lambda i, c: tb_step(c, gbatch)[0], s)

                return run

            t_cog_tb = _timed_loop(make_cog_tb_run, tb_state,
                                   name="cog_train_tb8")
            cog_tb_flops = _loop_flops(make_cog_tb_run, tb_state)

    # =====================================================================
    # priority 5 — end-to-end pixels -> fused preprocess -> ResNet-50 ->
    # features -> FeatureExtractor -> window head (BASELINE.json pipeline)
    # =====================================================================
    trunk = tv = frames0 = None
    with guard("e2e_setup"):
        from med_tpu.data.preprocessing import jax_preprocess_frames
        from med_tpu.models.resnet import ResNet50

        # bf16 trunk on TPU: params fp32, compute bfloat16 (MXU-native)
        trunk = ResNet50(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        frames0 = jnp.asarray(rng.normal(size=(NB, 240, 320, 3)) * 60 + 127,
                              jnp.float32)
        tv = trunk.init({"params": jax.random.key(2)},
                        jnp.zeros((1, 224, 224, 3)), train=False)

    if trunk is not None and exp is not None and _budget_left():
        with guard("e2e_infer"):
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

            t_e2e = _timed_loop(make_e2e_run, frames0, name="e2e_infer")
            e2e_frames_per_sec = NB / t_e2e
            e2e_vs_baseline = e2e_frames_per_sec / ref_cog_frames_per_sec

    # =====================================================================
    # priority 6 — int8 serving trunk A/B at the e2e shape (VERDICT r04
    # item 2): PTQ int8 vs the bf16 trunk, batch 128, calibration from the
    # real preprocess path.
    # =====================================================================
    if on_tpu and trunk is not None and _budget_left():
        with guard("int8_trunk"):
            from med_tpu.ops.quant import (quantize_resnet50_trunk,
                                           resnet50_int8_apply)

            pix_cal = jax_preprocess_frames(frames0[:8])
            qt = quantize_resnet50_trunk(tv, pix_cal)
            pix128 = jax_preprocess_frames(frames0)

            def make_i8_run():
                @jax.jit
                def run(fr, n):
                    def body(i, f):
                        feats = resnet50_int8_apply(qt, f)
                        return f + 1e-9 * jnp.mean(feats)

                    return jax.lax.fori_loop(0, n, body, fr)

                return run

            t_i8 = _timed_loop(make_i8_run, pix128, name="int8_trunk")
            ref16 = np.asarray(trunk.apply(tv, pix128[:16], train=False),
                               np.float32)
            got8 = np.asarray(resnet50_int8_apply(qt, pix128[:16]))
            i8_cos_mean = float(np.mean(
                np.sum(got8 * ref16, -1)
                / (np.linalg.norm(got8, axis=-1)
                   * np.linalg.norm(ref16, axis=-1) + 1e-12)))

    # =====================================================================
    # priority 7 — TransSVNet train step (frozen TeCNo -> transformer
    # refiner, T=1024; the collapsed class-width-bottleneck MHA)
    # =====================================================================
    if fbatch is not None and _budget_left():
        with guard("tsvn_train"):
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

            t_tsvn = _timed_loop(make_tsvn_run, tsvn_state, n_lo=20,
                                 n_hi=220, name="tsvn_train")

    # =====================================================================
    # priority 8 — fused window RUN (the production training path): a full
    # 30-epoch fold — train scans + per-epoch eval + on-device best-
    # checkpoint selection — as ONE device program. Wall-clock of one
    # program, not a slope; robust as-is.
    # =====================================================================
    if exp is not None and _budget_left():
        with guard("fused_run"):
            from med_tpu.data.datasets import WindowFold
            from med_tpu.train.fused import FusedWindowRun

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

            runner = FusedWindowRun(exp, cfg, _fold(Nf), _fold(1024))
            fstate = exp.init_state(jax.random.key(9), batch)
            fstate, _, fouts = runner.run(fstate, 0, N_EPOCHS)  # compile+warm
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
            _METHODS["fused_run"] = f"wall, best of {REPEATS}"

    # =====================================================================
    # priority 9 — window train step + COG frame inference (long-standing
    # comparison rows; cheapest information per compile, so they run last)
    # =====================================================================
    if exp is not None and _budget_left():
        with guard("window_train"):
            step = exp._make_step(train=True)

            def make_train_run():
                @jax.jit
                def run(s, n):
                    return jax.lax.fori_loop(
                        0, n, lambda i, c: step(c, batch)[0], s)

                return run

            t_train = _timed_loop(make_train_run,
                                  exp.init_state(jax.random.key(7), batch),
                                  n_hi=500, name="window_train")

    if exp_cog is not None and _budget_left():
        with guard("cog_infer"):
            def make_cog_run():
                @jax.jit
                def run(images, n):
                    def body(i, im):
                        feats = exp_cog.fe.apply(
                            {"params": cog_params["fe"]}, im)
                        x = jnp.concatenate(
                            [feats, fbatch["kinematics"]], axis=-1)
                        out_list, _ = exp_cog.model.apply(
                            {"params": cog_params["model"],
                             "constants": cog_state.constants["model"]},
                            x, train=False,
                        )
                        return im + 1e-12 * jnp.mean(out_list[0])

                    return jax.lax.fori_loop(0, n, body, images)

                return run

            t_cog = _timed_loop(make_cog_run, fbatch["images"], n_hi=500,
                                name="cog_infer")
            cog_frames_per_sec = T / t_cog
            cog_flops = _loop_flops(make_cog_run, fbatch["images"])

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
            "cog_ms_per_frame": round(t_cog / T * 1e3, 6) if t_cog > 0 else -1.0,
            "ref_cog_ms_per_frame": 1.95,
            "cog_train_step_ms": round(t_cog_train * 1e3, 3),
            "tsvn_train_step_ms": round(t_tsvn * 1e3, 3),
            "cog_train_frames_per_sec": round(T / t_cog_train, 1) if t_cog_train > 0 else -1.0,
            "cog_train_mfu": round(_mfu(cog_train_flops, t_cog_train), 4),
            "cog_train_tb8_step_ms": round(t_cog_tb * 1e3, 3),
            "cog_train_tb8_frames_per_sec": round(TB * T / t_cog_tb, 1) if t_cog_tb > 0 else -1.0,
            "cog_train_tb8_mfu": round(_mfu(cog_tb_flops, t_cog_tb), 4),
            "e2e_pixels_resnet_head_frames_per_sec": round(e2e_frames_per_sec, 1),
            "e2e_vs_baseline": round(e2e_vs_baseline, 2),
            "e2e_trunk_dtype": trunk_dtype,
            "int8_trunk_ms_per_batch128": round(t_i8 * 1e3, 3),
            "int8_trunk_frames_per_sec": round(NB / t_i8, 1) if t_i8 > 0 else -1.0,
            "int8_cosine_vs_bf16": round(i8_cos_mean, 5),
            "resnet_train_step_ms": round(t_rft * 1e3, 3),
            "resnet_train_frames_per_sec": round(32 / t_rft, 1) if t_rft > 0 else -1.0,
            "resnet_train_mfu": round(_mfu(rft_flops, t_rft), 4),
            # fraction of chip peak (v5e bf16 ≈ 197 TFLOP/s unless overridden)
            "int8_window_windows_per_sec": round(B / t_i8w, 1) if t_i8w > 0 else -1.0,
            "int8_window_speedup_vs_bf16": round(t_infer / t_i8w, 2) if t_i8w > 0 and t_infer > 0 else -1.0,
            "int8_store_windows_per_sec": round(B / t_i8s, 1) if t_i8s > 0 else -1.0,
            "int8_store_speedup_vs_bf16": round(t_infer / t_i8s, 2) if t_i8s > 0 and t_infer > 0 else -1.0,
            "window_infer_mfu": round(_mfu(infer_flops, t_infer), 4),
            "window_infer_mfu_trace": round(window_infer_mfu_trace, 4),
            "window_infer_span_us_trace": round(window_infer_span_us, 2),
            "cog_infer_mfu": round(_mfu(cog_flops, t_cog), 4),
            "peak_flops_assumed": PEAK_FLOPS,
            "timing": ("guarded two-point slope (widen on bad span; "
                       f"trace-span fallback), best of {REPEATS}; "
                       "per-sub-bench exception guards"),
            "timing_methods": dict(_METHODS),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
