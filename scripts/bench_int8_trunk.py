"""A/B the int8 serving trunk vs the bf16 trunk on real TPU (batch 128,
224x224 — the e2e bench shape). Two-point-slope timing per CLAUDE.md.

Usage: python scripts/bench_int8_trunk.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from med_tpu.cli.common import enable_compilation_cache
from med_tpu.models.resnet import ResNet50
from med_tpu.ops.quant import quantize_resnet50_trunk, resnet50_int8_apply

REPEATS = 3


def timed_slope(run, carry, n_lo=20, n_hi=100):
    lo, hi = jnp.asarray(n_lo), jnp.asarray(n_hi)
    carry = jax.block_until_ready(run(carry, lo))
    best_lo = best_hi = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, lo))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, hi))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (n_hi - n_lo)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    NB = 128
    pix = jnp.asarray(rng.normal(size=(NB, 224, 224, 3)), jnp.float32)

    trunk = ResNet50(dtype=jnp.bfloat16)
    t0 = time.time()
    tv = jax.jit(lambda: trunk.init(
        {"params": jax.random.key(2)}, jnp.zeros((1, 224, 224, 3)),
        train=False))()
    print("init", time.time() - t0, flush=True)

    t0 = time.time()
    qt = quantize_resnet50_trunk(tv, pix[:8])
    print("quantize+calibrate", time.time() - t0, flush=True)

    @jax.jit
    def run_bf16(fr, n):
        def body(i, f):
            feats = trunk.apply(tv, f, train=False)
            return f + 1e-9 * jnp.mean(feats)
        return jax.lax.fori_loop(0, n, body, fr)

    @jax.jit
    def run_i8(fr, n):
        def body(i, f):
            feats = resnet50_int8_apply(qt, f)
            return f + 1e-9 * jnp.mean(feats)
        return jax.lax.fori_loop(0, n, body, fr)

    t_bf16 = timed_slope(run_bf16, pix)
    print(f"bf16 trunk: {t_bf16*1e3:.3f} ms/step "
          f"({NB/t_bf16:.0f} frames/s)", flush=True)
    t_i8 = timed_slope(run_i8, pix)
    print(f"int8 trunk: {t_i8*1e3:.3f} ms/step "
          f"({NB/t_i8:.0f} frames/s)  speedup {t_bf16/t_i8:.2f}x", flush=True)

    # numeric drift on this batch
    ref = np.asarray(trunk.apply(tv, pix[:16], train=False), np.float32)
    got = np.asarray(resnet50_int8_apply(qt, pix[:16]))
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    print("cosine(int8, bf16) min/mean:", cos.min(), cos.mean(), flush=True)


if __name__ == "__main__":
    main()
