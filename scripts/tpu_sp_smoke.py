"""Real-TPU SP x Pallas smoke: one SP COG train step + eval on a mesh of 1.

Proves the PACKED Pallas attention kernels (ops/attention.py, custom VJP
included) compile and execute under jax.shard_map with full VMA checking on
hardware — the one link the CPU tests cannot pin (interpret mode needs
check_vma=False, tests/test_sp_cog.py::test_sp_cog_pallas_kernel_under_
shard_map). A mesh of 1 exercises the identical program structure (shard_map
tracing, VMA-annotated pallas_call outputs, loss psums) minus multi-chip ICI,
which the 8-way CPU-mesh tests cover with the XLA attention body.

Usage: python scripts/tpu_sp_smoke.py   (~2-4 min, mostly relay compiles)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from med_tpu.config import ExperimentConfig
from med_tpu.data.datasets import FrameTrial
from med_tpu.data.labels import skill_one_hot
from med_tpu.parallel import make_mesh
from med_tpu.parallel.sp_train import SPFrameTrainer


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    mesh = make_mesh(shape=(1,), devices=jax.devices()[:1])
    cfg = ExperimentConfig(
        model_name="COG", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, use_pallas=True, mstcn_stages=8,
        n_epochs=1, lr=1e-3,
    )
    trainer = SPFrameTrainer(cfg, mesh)
    T = 992  # true_len < bucket exercises the masked losses
    rng = np.random.default_rng(0)
    e = np.zeros((T, 7), np.int64)
    err = rng.random(T) < 0.4
    e[err, 6] = 1
    e[err, 0] = 1
    e[~err, 5] = 1
    trial = FrameTrial(
        name="Needle_Passing_B001",
        images=np.zeros((T, 4), np.float32),
        kinematics=rng.normal(size=(T, 26)).astype(np.float32),
        g_labels=np.ones(T, np.int64),
        e_powerset=e,
        skill=skill_one_hot("Needle_Passing_B001", T),
    )
    bucket = trainer.bucket_for([trial])
    print(f"mesh={dict(mesh.shape)} bucket={bucket} use_pallas=True")
    state = trainer.init_state(jax.random.key(0), trial, bucket)
    batch = trainer.shard(trainer.make_batch(trial, bucket))

    t0 = time.time()
    state, m = trainer.train_step(state, batch)
    loss = float(m["loss"])
    print(f"SP COG train step (Pallas attention, shard_map, VMA on): "
          f"loss={loss:.4f} cm=\n{np.asarray(m['cm'])} "
          f"[{time.time() - t0:.1f}s incl. compile]")
    assert np.isfinite(loss)

    t0 = time.time()
    ev = trainer.eval_step(state, batch)
    print(f"SP COG eval step: loss={float(ev['loss']):.4f} "
          f"[{time.time() - t0:.1f}s incl. compile]")
    assert np.isfinite(float(ev["loss"]))
    print("tpu_sp_smoke: ok")


if __name__ == "__main__":
    main()
