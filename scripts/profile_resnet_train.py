"""Device-trace profile of the ResNet-50 fine-tune TRAIN step (the bench.py
resnet_train section: batch 32, on-device augment, BCE head, Adam).
Prints exclusive us/iter buckets via xplane_timeline.

Usage: python scripts/profile_resnet_train.py [batch] [--no-augment]
           [--freeze-bn] [--bn-stat-stride=N]

--freeze-bn mirrors the driver's knob (cli/resnet_finetune.py): BN on
running statistics, all params still trained.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from med_tpu.cli.common import enable_compilation_cache
    from med_tpu.data.augment import augment_batch
    from med_tpu.models.resnet import ResNetClassifier
    from med_tpu.train.losses import bce_with_logits

    enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    RB = int(args[0]) if args else 32
    use_aug = "--no-augment" not in sys.argv
    freeze_bn = "--freeze-bn" in sys.argv
    bn_stride = 1
    for a in sys.argv[1:]:
        if a.startswith("--bn-stat-stride="):
            bn_stride = int(a.split("=", 1)[1])

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    clf = ResNetClassifier(dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                           bn_stat_stride=bn_stride)
    rimgs = jnp.asarray(rng.normal(size=(RB, 224, 224, 3)) * 60 + 127,
                        jnp.float32)
    rlabels = jnp.asarray(rng.integers(0, 2, RB), jnp.float32)
    rvars = jax.jit(functools.partial(clf.init, train=False))(
        {"params": jax.random.key(6)}, jnp.zeros((1, 224, 224, 3)))
    rtx = optax.adam(5e-4)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, n):
        def body(i, c):
            params, stats, opt = c
            key = jax.random.fold_in(jax.random.key(11), i)
            norm = (jnp.full((3,), 0.45), jnp.full((3,), 0.22))
            imgs = (augment_batch(key, rimgs, normalize=norm) if use_aug
                    else (rimgs / 255.0 - 0.45) / 0.22)

            def loss_fn(p):
                if freeze_bn:
                    logits = clf.apply(
                        {"params": p, "batch_stats": stats},
                        imgs, train=False,
                    )
                    return bce_with_logits(logits, rlabels), stats
                logits, mut = clf.apply(
                    {"params": p, "batch_stats": stats},
                    imgs, train=True,
                    mutable=["batch_stats"],
                )
                return bce_with_logits(logits, rlabels), mut["batch_stats"]

            (_, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt2 = rtx.update(grads, opt)
            return (optax.apply_updates(params, updates), new_stats, opt2)

        return jax.lax.fori_loop(0, n, body, carry)

    carry = (rvars["params"], rvars["batch_stats"], rtx.init(rvars["params"]))
    carry = jax.block_until_ready(run(carry, jnp.asarray(3)))
    logdir = "/tmp/rfttrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    carry = jax.block_until_ready(run(carry, jnp.asarray(10)))
    jax.profiler.stop_trace()
    del carry
    os.system(f"python {os.path.dirname(os.path.abspath(__file__))}"
              f"/xplane_timeline.py {logdir} 10 40")


if __name__ == "__main__":
    main()
