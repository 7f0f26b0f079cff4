"""Capture a device trace of the TSVN train step (T=1024 default) and leave
it in /tmp/tsvntrace for scripts/xplane_timeline.py."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from med_tpu.cli.common import enable_compilation_cache
    from med_tpu.config import ExperimentConfig
    from med_tpu.train.engine import Experiment

    enable_compilation_cache()
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    cfg = ExperimentConfig(
        model_name="TransSVNet", dataset_type="frame",
        data_type="multimodal", out_features=2, batch_size=1,
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
    state = jax.jit(functools.partial(exp.init_state,
                                      frozen={"tecno_params": tp}))(
        jax.random.key(3), fbatch)
    step = exp._make_step(train=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(s, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, fbatch)[0], s)

    state = jax.block_until_ready(run(state, jnp.asarray(20)))
    logdir = "/tmp/tsvntrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    state = jax.block_until_ready(run(state, jnp.asarray(50)))
    jax.profiler.stop_trace()
    print("trace written to", logdir)


if __name__ == "__main__":
    main()
