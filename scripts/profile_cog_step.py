"""Capture a device trace of the COG train step and print the top ops by
device time (xplane parsed directly — no TensorBoard UI needed)."""

import functools
import glob
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
        model_name="COG", dataset_type="frame", data_type="multimodal",
        out_features=2, batch_size=1, mstcn_stages=8,
        use_pallas=jax.default_backend() == "tpu",
    )
    exp = Experiment(cfg)
    fbatch = {
        "images": jnp.asarray(rng.normal(size=(1, T, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(1, T, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, T)),
        "mask": jnp.ones(T, jnp.float32),
        "true_len": jnp.asarray(T, jnp.int32),
    }
    state = jax.jit(exp.init_state)(jax.random.key(3), fbatch)
    step = exp._make_step(train=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(s, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, fbatch)[0], s)

    state = jax.block_until_ready(run(state, jnp.asarray(20)))
    logdir = "/tmp/cogtrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    state = jax.block_until_ready(run(state, jnp.asarray(50)))
    jax.profiler.stop_trace()

    # parse the xplane: sum device-op durations by name
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e6
            print(f"== plane {plane.name} (us totals over 50 iters)")
            for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {us/50:9.2f} us/iter  {name[:110]}")


if __name__ == "__main__":
    main()
