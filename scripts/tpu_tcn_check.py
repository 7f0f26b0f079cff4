"""On-TPU validation + timing for the fused TCN stack (ops/tcn_fused.py).

The CPU suite exercises the kernels in interpret mode; this script validates
the real Mosaic lowering (dynamic-start VMEM slices, uint8 mask blocks,
scratch carried across grid steps) and measures the COG train step that
motivated the fusion (round-1: 33.8 ms at T=1024; VERDICT target <= 25 ms).

Run: python scripts/tpu_tcn_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from med_tpu.ops.tcn_fused import dilated_residual_stack, dilated_stack_xla

ITERS = 20


def check_op():
    rng = np.random.default_rng(0)
    L, T, C = 6, 256, 64
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(L, 3, C, C)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(L, C)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(L, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(L, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(L, T, C)), jnp.uint8)

    for causal in (True, False):
        for m in (None, mask):
            got = dilated_residual_stack(x, w3, b3, w1, b1, causal=causal,
                                         mask=m, interpret=False)
            # oracle at HIGHEST precision: the kernel's matmuls are fp32
            # (Precision.HIGHEST) while XLA's TPU default is bf16 inputs
            with jax.default_matmul_precision("highest"):
                want = dilated_stack_xla(x, w3, b3, w1, b1, causal=causal,
                                         mask=m)
            err = float(jnp.max(jnp.abs(got - want)))
            rel = err / float(jnp.max(jnp.abs(want)))
            print(f"fwd causal={causal} mask={m is not None}: rel err {rel:.2e}")
            assert rel < 1e-4, (causal, m is not None, rel)

    probe = jnp.cos(jnp.arange(x.size).reshape(x.shape) * 0.01)
    for m in (None, mask):
        def loss(fn):
            def f(x, w3, b3, w1, b1):
                return jnp.sum(fn(x, w3, b3, w1, b1, causal=True, mask=m) * probe)
            return f

        got = jax.grad(loss(lambda *a, **k: dilated_residual_stack(
            *a, interpret=False, **k)), argnums=(0, 1, 2, 3, 4))(x, w3, b3, w1, b1)
        # run the oracle at HIGHEST precision: TPU's default bf16 matmul
        # inputs would otherwise make the *oracle* the noisy side
        with jax.default_matmul_precision("highest"):
            want = jax.grad(loss(dilated_stack_xla), argnums=(0, 1, 2, 3, 4))(
                x, w3, b3, w1, b1)
        for name, g, w in zip("x w3 b3 w1 b1".split(), got, want):
            rel = float(jnp.max(jnp.abs(g - w)) / (jnp.max(jnp.abs(w)) + 1e-9))
            print(f"grad[{name}] mask={m is not None}: rel err {rel:.2e}")
            assert rel < 1e-3, (name, rel)
    print("op-level TPU checks OK")


def time_cog_train(T=1024):
    from med_tpu.config import ExperimentConfig
    from med_tpu.train.engine import Experiment

    rng = np.random.default_rng(1)
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="multimodal",
        out_features=2, batch_size=1, mstcn_stages=8, use_pallas=True,
    )
    exp = Experiment(cfg)
    batch = {
        "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)), jnp.float32),
        "labels": jnp.zeros(T, jnp.int32),
        "mask": jnp.ones(T, jnp.float32),
        "true_len": jnp.asarray(T, jnp.int32),
    }
    state = exp.init_state(jax.random.key(1), batch)
    step = exp._make_step(train=True)

    @jax.jit
    def run(s):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: step(c, batch)[0], s)

    state = jax.block_until_ready(run(state))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"COG train step T={T}: {ms:.2f} ms/step "
          f"({T / (best / ITERS):,.0f} frames/s) [round-1: 33.8 ms]")
    return ms


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_op()
    time_cog_train()
