"""A/B the ResNet-50 trunk inference: XLA conv path vs the VMEM-fused
stride-1 stage kernels (ops/resnet_fused.py), batch 128 bf16 on TPU.

Usage: python scripts/bench_resnet_fused.py [batch] [stages...]
e.g.  python scripts/bench_resnet_fused.py 128 0 1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.cli.common import enable_compilation_cache
    from med_tpu.models.resnet import ResNet50
    from med_tpu.ops.resnet_fused import resnet50_fused_apply

    enable_compilation_cache()
    args = [a for a in sys.argv[1:]]
    NB = int(args[0]) if args else 128
    stages = tuple(int(a) for a in args[1:]) if len(args) > 1 else (0, 1)

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    trunk = ResNet50(dtype=dtype)
    x0 = jnp.asarray(rng.normal(size=(NB, 224, 224, 3)), jnp.float32)
    tv = jax.jit(lambda: trunk.init({"params": jax.random.key(2)},
                                    jnp.zeros((1, 224, 224, 3)),
                                    train=False))()

    def timed(run, carry):
        lo, hi = jnp.asarray(20), jnp.asarray(100)
        carry = jax.block_until_ready(run(carry, lo))
        best_lo = best_hi = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            carry = jax.block_until_ready(run(carry, lo))
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            carry = jax.block_until_ready(run(carry, hi))
            best_hi = min(best_hi, time.perf_counter() - t0)
        return (best_hi - best_lo) / 80

    @jax.jit
    def run_xla(fr, n):
        def body(i, f):
            feats = trunk.apply(tv, f, train=False)
            return f + 1e-9 * jnp.mean(feats)
        return jax.lax.fori_loop(0, n, body, fr)

    @jax.jit
    def run_fused(fr, n):
        def body(i, f):
            feats = resnet50_fused_apply(tv, f, dtype=dtype,
                                         fused_stages=stages)
            return f + 1e-9 * jnp.mean(feats)
        return jax.lax.fori_loop(0, n, body, fr)

    # numerics check on device first
    a = np.asarray(trunk.apply(tv, x0[:8], train=False), np.float32)
    b = np.asarray(resnet50_fused_apply(tv, x0[:8], dtype=dtype,
                                        fused_stages=stages), np.float32)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    print(f"device rel-l2 fused vs XLA trunk: {rel:.2e}")

    t_x = timed(run_xla, x0)
    print(f"XLA trunk:   {t_x*1e3:8.3f} ms/iter  ({NB/t_x:,.0f} frames/s)")
    t_f = timed(run_fused, x0)
    print(f"fused {stages}: {t_f*1e3:8.3f} ms/iter  ({NB/t_f:,.0f} frames/s)"
          f"  speedup {t_x/t_f:.3f}x")


if __name__ == "__main__":
    main()
