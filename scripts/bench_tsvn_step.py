"""TSVN train-step timer + component breakdown (two-point-slope method).

Usage: python scripts/bench_tsvn_step.py [T]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, carry, lo=20, hi=100):
    import jax
    import jax.numpy as jnp

    carry = jax.block_until_ready(run(carry, jnp.asarray(lo)))
    best_lo = best_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, jnp.asarray(lo)))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry, jnp.asarray(hi)))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from med_tpu.config import ExperimentConfig
    from med_tpu.models.tcn import TeCNo
    from med_tpu.train.engine import Experiment

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    cfg = ExperimentConfig(
        model_name="TransSVNet", dataset_type="frame", data_type="multimodal",
        out_features=2, batch_size=1,
    )
    exp = Experiment(cfg)
    tecno = exp.frozen_tecno
    tp = jax.jit(lambda r, x: tecno.init(r, x, train=False))(
        {"params": jax.random.key(5)},
        jnp.zeros((1, 256, cfg.in_features())))["params"]
    fbatch = {
        "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, T)),
        "mask": jnp.ones(T, jnp.float32),
        "true_len": jnp.asarray(T, jnp.int32),
        "tecno_logits": jnp.zeros((1, T, 2), jnp.float32),
    }
    t0 = time.time()
    state = jax.jit(functools.partial(exp.init_state,
                                      frozen={"tecno_params": tp}))(
        jax.random.key(3), fbatch)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    step = exp._make_step(train=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(s, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, fbatch)[0], s)

    t0 = time.time()
    state = jax.block_until_ready(run(state, jnp.asarray(20)))
    print(f"compile+warm: {time.time() - t0:.1f}s", flush=True)
    # the timer donates `state`'s buffers; copy the params out FIRST
    params = jax.tree.map(jnp.copy, exp.params_tree(state.params)["model"])
    print(f"tsvn_train_step_ms T={T}: {timed(run, state):.3f}", flush=True)

    # ---- component breakdown (forward-only chains) ----
    from med_tpu.models.transsvnet import MHA, PoswiseFFN, TransSVNet
    from med_tpu.ops.attention import sliding_windows

    model = exp.model
    logits = jnp.asarray(rng.normal(size=(1, T, 2)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, T, cfg.in_features())), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=())
    def fwd_loop(x, n):
        def body(i, c):
            out = model.apply({"params": params}, c, feats)
            return c + out * 1e-9
        return jax.lax.fori_loop(0, n, body, x)

    print(f"tsvn_fwd_ms: {timed(fwd_loop, logits):.3f}", flush=True)

    @functools.partial(jax.jit, donate_argnums=())
    def grad_loop(x, n):
        def one(c):
            def loss(p):
                out = model.apply({"params": p}, c, feats)
                return jnp.sum(out ** 2)
            return jax.grad(loss)(params)

        def body(i, c):
            g = one(c)
            return c + jax.tree.leaves(g)[0].sum() * 1e-12
        return jax.lax.fori_loop(0, n, body, x)

    print(f"tsvn_fwd_bwd_ms: {timed(grad_loop, logits):.3f}", flush=True)


if __name__ == "__main__":
    main()
