"""A/B the int8 FeatureExtractor vs the bf16/f32 FE on the window-inference
headline path (batch 512, W=10 — the bench.py configuration), on real TPU.

The headline loop is trace-measured at 0.70-0.73 MFU: the FE's 2048->512
matmul is MXU-bound AND reads 42 MB of f32 features per step (~51 us at
wire speed), so the expected int8 win is bounded by the input read, not
the 2x s8 MXU peak. Guarded two-point-slope timing (bench.py).

Usage: python scripts/bench_int8_window.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from med_tpu.cli.common import enable_compilation_cache
from med_tpu.config import ExperimentConfig
from med_tpu.ops.quant import fe_int8_apply, quantize_fe
from med_tpu.train.engine import Experiment


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    B = 512
    cfg = ExperimentConfig(model_name="SimpleCNN", data_type="multimodal",
                           use_pallas=on_tpu)
    exp = Experiment(cfg)
    W = cfg.window_size
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, W, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(B, W, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, B)),
        "mask": jnp.ones(B, jnp.float32),
    }
    state = exp.init_state(jax.random.key(0), batch)
    qfe = quantize_fe(state.params["fe"], np.asarray(batch["images"][:32]))

    def head(feats):
        x = jnp.concatenate([feats, batch["kinematics"]], axis=-1)
        return exp.model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats["model"]},
            x, train=False)

    def make_ref():
        @jax.jit
        def run(images, n):
            def body(i, im):
                logits = head(exp.fe.apply({"params": state.params["fe"]}, im))
                return im + 1e-12 * jnp.mean(logits)
            return jax.lax.fori_loop(0, n, body, images)
        return run

    def make_i8():
        @jax.jit
        def run(images, n):
            def body(i, im):
                logits = head(fe_int8_apply(qfe, im))
                return im + 1e-12 * jnp.mean(logits)
            return jax.lax.fori_loop(0, n, body, images)
        return run

    def make_i8_store():
        """Serving from an int8 FEATURE STORE: the input read (the wall —
        42 MB f32/step) drops 4x; layer-0 quantize happens at export."""
        from med_tpu.ops.quant import quantize_fe_input

        @jax.jit
        def run(imq, n):
            def body(i, q):
                logits = head(fe_int8_apply(qfe, q))
                # data dependency that keeps the int8 carry int8: xor the
                # low bit with a logits-derived 0/1 (can't be hoisted)
                bit = (jnp.sum(logits) > 0).astype(jnp.int8)
                return jnp.bitwise_xor(q, bit)
            return jax.lax.fori_loop(0, n, body, imq)
        return run, quantize_fe_input(qfe, batch["images"])

    t_ref = bench._timed_loop(make_ref, batch["images"], n_hi=1000, name="ref")
    print(f"ref FE+head: {t_ref*1e6:.1f} us/step ({B/t_ref:.0f} windows/s)",
          flush=True)
    t_i8 = bench._timed_loop(make_i8, batch["images"], n_hi=1000, name="int8")
    print(f"int8 FE+head: {t_i8*1e6:.1f} us/step ({B/t_i8:.0f} windows/s)  "
          f"speedup {t_ref/t_i8:.2f}x", flush=True)
    mk_store, imq = make_i8_store()
    t_st = bench._timed_loop(lambda: mk_store, imq, n_hi=1000, name="store")
    print(f"int8 store+FE+head: {t_st*1e6:.1f} us/step "
          f"({B/t_st:.0f} windows/s)  speedup {t_ref/t_st:.2f}x", flush=True)
    print("methods:", bench._METHODS, flush=True)

    # logits drift on the same batch
    ref = np.asarray(head(exp.fe.apply({"params": state.params["fe"]},
                                       batch["images"])), np.float32)
    got = np.asarray(head(fe_int8_apply(qfe, batch["images"])), np.float32)
    denom = max(float(np.max(np.abs(ref))), 1e-6)
    print("logits max|diff| / max|ref|:", float(np.max(np.abs(got - ref))) / denom,
          flush=True)


if __name__ == "__main__":
    main()
