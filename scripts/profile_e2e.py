"""Device-trace profile of the e2e pixels->preprocess->ResNet50->FE->head
pipeline (the BASELINE.json serving path; same graph as bench.py's e2e
section). Prints exclusive us/iter buckets via xplane_timeline.

Usage: python scripts/profile_e2e.py [batch] [--trunk-only]
"""

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
    from med_tpu.data.preprocessing import jax_preprocess_frames
    from med_tpu.models.resnet import ResNet50
    from med_tpu.train.engine import Experiment

    enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    NB = int(args[0]) if args else 128
    trunk_only = "--trunk-only" in sys.argv

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    trunk = ResNet50(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    frames0 = jnp.asarray(rng.normal(size=(NB, 240, 320, 3)) * 60 + 127,
                          jnp.float32)
    tv = jax.jit(functools.partial(trunk.init, train=False))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 224, 224, 3)))

    cfg = ExperimentConfig(model_name="SimpleCNN", data_type="multimodal")
    exp = Experiment(cfg)
    n_win = max(NB // 10, 1)
    wbatch = {
        "images": jnp.asarray(rng.normal(size=(n_win, 10, 2048)),
                              jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(n_win, 10, 26)),
                                  jnp.float32),
        "labels": jnp.zeros((n_win,), jnp.int32),
        "mask": jnp.ones((n_win,), jnp.float32),
    }
    state = jax.jit(exp.init_state)(jax.random.key(3), wbatch)

    @jax.jit
    def run(frames, n):
        def body(i, fr):
            pix = jax_preprocess_frames(fr)
            feats = trunk.apply(tv, pix, train=False)
            if trunk_only:
                return fr + 1e-9 * jnp.mean(feats)
            n_win = NB // 10
            w = feats[: n_win * 10].reshape(n_win, 10, 2048)
            fe_out = exp.fe.apply({"params": state.params["fe"]}, w)
            x = jnp.concatenate([fe_out, wbatch["kinematics"]], axis=-1)
            logits = exp.model.apply(
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]},
                x, train=False)
            return fr + 1e-9 * jnp.mean(logits)

        return jax.lax.fori_loop(0, n, body, frames)

    out = jax.block_until_ready(run(frames0, jnp.asarray(5)))
    logdir = "/tmp/e2etrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = jax.block_until_ready(run(frames0, jnp.asarray(30)))
    jax.profiler.stop_trace()
    del out
    os.system(f"python {os.path.dirname(os.path.abspath(__file__))}"
              f"/xplane_timeline.py {logdir} 30 40")


if __name__ == "__main__":
    main()
