"""Quick COG train-step timer for perf iteration (two-point-slope method,
same measurement rules as bench.py: chained lax.fori_loop, marginal rate).

Usage: python scripts/bench_cog_step.py [T]
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

    enable_compilation_cache()

    from med_tpu.config import ExperimentConfig
    from med_tpu.train.engine import Experiment

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="multimodal",
        out_features=2, batch_size=1, mstcn_stages=8, use_pallas=on_tpu,
        flat_params=os.environ.get("MED_FLAT", "1") == "1",
    )
    exp = Experiment(cfg)
    fbatch = {
        "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, T)),
        "mask": jnp.ones(T, jnp.float32),
        "true_len": jnp.asarray(T, jnp.int32),
    }
    t0 = time.time()
    state = jax.jit(exp.init_state)(jax.random.key(3), fbatch)
    print(f"init: {time.time() - t0:.1f}s")

    step = exp._make_step(train=True)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(s, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, fbatch)[0], s)

    t0 = time.time()
    state = jax.block_until_ready(run(state, jnp.asarray(20)))
    print(f"compile+warm: {time.time() - t0:.1f}s")

    best_lo = best_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state, jnp.asarray(20)))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state, jnp.asarray(100)))
        best_hi = min(best_hi, time.perf_counter() - t0)
    ms = (best_hi - best_lo) / 80 * 1e3
    print(f"cog_train_step_ms T={T}: {ms:.3f}")


if __name__ == "__main__":
    main()
