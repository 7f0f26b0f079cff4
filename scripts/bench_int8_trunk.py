"""A/B the int8 serving trunk vs the bf16 trunk on real TPU (batch 128,
224x224 — the e2e bench shape). Guarded two-point-slope timing (bench.py).

Calibration uses the REAL preprocess path (synthetic 240x320 frames ->
jax_preprocess_frames), not raw N(0,1) noise, so the static activation
scales and the printed cosine drift reflect serving conditions (round-4
ADVICE item 3).

Usage: python scripts/bench_int8_trunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from med_tpu.cli.common import enable_compilation_cache
from med_tpu.data.preprocessing import jax_preprocess_frames
from med_tpu.models.resnet import ResNet50
from med_tpu.ops.quant import quantize_resnet50_trunk, resnet50_int8_apply


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    NB = 128
    frames = jnp.asarray(rng.normal(size=(NB, 240, 320, 3)) * 60 + 127,
                         jnp.float32)
    pix = jax_preprocess_frames(frames)  # (NB, 224, 224, 3), normalized

    trunk = ResNet50(dtype=jnp.bfloat16)
    t0 = time.time()
    tv = jax.jit(lambda: trunk.init(
        {"params": jax.random.key(2)}, jnp.zeros((1, 224, 224, 3)),
        train=False))()
    print("init", time.time() - t0, flush=True)

    t0 = time.time()
    qt = quantize_resnet50_trunk(tv, pix[:8])
    print("quantize+calibrate", time.time() - t0, flush=True)

    def make_bf16():
        @jax.jit
        def run(fr, n):
            def body(i, f):
                feats = trunk.apply(tv, f, train=False)
                return f + 1e-9 * jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body, fr)
        return run

    def make_i8():
        @jax.jit
        def run(fr, n):
            def body(i, f):
                feats = resnet50_int8_apply(qt, f)
                return f + 1e-9 * jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body, fr)
        return run

    t_bf16 = bench._timed_loop(make_bf16, pix, name="bf16")
    print(f"bf16 trunk: {t_bf16*1e3:.3f} ms/step "
          f"({NB/t_bf16:.0f} frames/s)", flush=True)
    t_i8 = bench._timed_loop(make_i8, pix, name="int8")
    print(f"int8 trunk: {t_i8*1e3:.3f} ms/step "
          f"({NB/t_i8:.0f} frames/s)  speedup {t_bf16/t_i8:.2f}x", flush=True)
    print("methods:", bench._METHODS, flush=True)

    # numeric drift on a real-preprocess batch
    ref = np.asarray(trunk.apply(tv, pix[:16], train=False), np.float32)
    got = np.asarray(resnet50_int8_apply(qt, pix[:16]))
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    print("cosine(int8, bf16) min/mean:", cos.min(), cos.mean(), flush=True)
    # fp32 oracle on the same batch for an absolute reference
    trunk32 = ResNet50(dtype=jnp.float32)
    ref32 = np.asarray(trunk32.apply(tv, pix[:16], train=False))
    cos32 = np.sum(got * ref32, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref32, axis=-1))
    print("cosine(int8, fp32) min/mean:", cos32.min(), cos32.mean(),
          flush=True)


if __name__ == "__main__":
    main()
