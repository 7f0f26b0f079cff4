"""Micro-bench the packed sliding-window attention kernels across tile
sizes (two-point-slope, chained fori_loop per CLAUDE.md measurement rules).

Usage: python scripts/bench_swa_tiles.py [T]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, carry, lo=200, hi=2000):
    import jax
    import jax.numpy as jnp

    carry = jax.block_until_ready(run(carry, jnp.asarray(lo)))
    best_lo = best_hi = float("inf")
    for _ in range(3):
        # chain the carry through every dispatch: the axon relay memoizes
        # repeated identical (fn, args) dispatches (CLAUDE.md measurement
        # rule), so each timed call must see a fresh carry
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, jnp.asarray(lo)))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, jnp.asarray(hi)))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (hi - lo) * 1e6  # us/iter


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from med_tpu.ops.attention import (
        sliding_window_attention_packed_bwd,
        sliding_window_attention_packed_fwd,
    )

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    H, dk, dv, M, W = 8, 8, 8, 15, 30
    N = T * M
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(H, dk, N)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(H, dk, T)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(H, dv, T)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(H, dv, N)), jnp.float32)

    # the packed token axis is lanes: tile*M must be a 128-multiple, and
    # gcd(M=15, 128) = 1 forces tile itself to be a 128-multiple
    for tile in (128, 256, 512):
        fwd = functools.partial(
            sliding_window_attention_packed_fwd, window=W, m=M, tile=tile)

        @jax.jit
        def frun(c, n, fwd=fwd):
            def body(i, c):
                o = fwd(c, k, v)
                return c + o * 1e-9
            return jax.lax.fori_loop(0, n, body, c)

        us_f = timed(frun, q)

        bwd = functools.partial(
            sliding_window_attention_packed_bwd, window=W, m=M, tile=tile)
        # out/stats held fixed across iterations (timing only: the kernel's
        # cost doesn't depend on their values, and recomputing them per
        # iteration would fold a forward into the bwd-only number)
        o, stats = sliding_window_attention_packed_fwd(
            q, k, v, W, M, tile=tile, return_stats=True)

        @jax.jit
        def brun(c, n, bwd=bwd, o=o, stats=stats):
            def body(i, c):
                dq, dkk, dvv = bwd(c, k, v, g, o, stats)
                return c + dq * 1e-9
            return jax.lax.fori_loop(0, n, body, c)

        try:
            us_b = timed(brun, q)
        except Exception as e:  # VMEM OOM at large tiles
            print(f"tile={tile:4d}  fwd {us_f:7.1f} us  bwd FAILED "
                  f"({type(e).__name__})", flush=True)
            continue
        print(f"tile={tile:4d}  fwd {us_f:7.1f} us  bwd {us_b:7.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
