"""Per-fold ResNet-50 fine-tuning on raw frames + feature export
(reference notebooks/resnet_finetuning.ipynb + the create_pkl_files feature
path, preprocessing_utils.py:722-823).

Input: fold dirs whose trial files carry raw frames — ``image_feats`` of
shape (N, H, W, 3) uint8 (or float 0..255). Per fold: train trunk + fc
2048->512->1 with BCE on the binary error label (batch 32, 5 epochs, lr 5e-4
— reference cell 6), keep the best-test-accuracy checkpoint, then swap the
head for the trunk output and export (N, 2048) features as
``<out>/<fold>/<trial>.npz`` trials consumable by every other driver.

Pixel path: /255 + per-fold channel mean/std normalization on device (the
fused JAX preprocessing graph), matching the reference's transform
(image_transform, preprocessing_utils.py:697-705).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..data.trials import Trial, fold_file_list, load_trial, save_trial_npz
from ..ops.metrics import confusion_matrix, metrics_from_cm
from ..tracking import RunTracker
from ..train.checkpoint import save_checkpoint


def _batches(images, labels, batch_size, shuffle, seed):
    n = len(images)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for s in range(0, n, batch_size):
        take = idx[s : s + batch_size]
        pad = batch_size - len(take)
        sel = np.concatenate([take, np.zeros(pad, np.int64)]) if pad else take
        mask = np.concatenate([np.ones(len(take), np.float32),
                               np.zeros(pad, np.float32)])
        yield images[sel], labels[sel], mask


def finetune_fold(fold_dir, args, tracker, fold_name):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.resnet import ResNetClassifier
    from ..train.losses import bce_with_logits

    def load_split(csv):
        imgs, labels, names, lengths = [], [], [], []
        for fname in fold_file_list(fold_dir, csv):
            t = load_trial(os.path.join(fold_dir, fname))
            if t.image_feats.ndim != 4:
                raise SystemExit(
                    f"{fname}: expected raw frames (N,H,W,3); got "
                    f"{t.image_feats.shape} — this driver needs raw-frame folds"
                )
            imgs.append(t.image_feats)
            labels.append(t.e_labels[:, 4])
            names.append(t)
            lengths.append(t.n_frames)
        return np.concatenate(imgs), np.concatenate(labels), names

    train_imgs, train_labels, train_trials = load_split("train.csv")
    test_imgs, test_labels, test_trials = load_split("test.csv")
    mean = (train_imgs.reshape(-1, 3).mean(0) / 255.0).astype(np.float32)
    std = (train_imgs.reshape(-1, 3).std(0) / 255.0 + 1e-6).astype(np.float32)

    model = ResNetClassifier(bn_stat_stride=args.bn_stat_stride)
    rng = jax.random.key(args.seed)
    sample = jnp.zeros((args.batch_size, *train_imgs.shape[1:3], 3), jnp.float32)
    variables = model.init({"params": rng}, sample, train=False)
    params, batch_stats = dict(variables["params"]), dict(variables["batch_stats"])
    if args.init_weights:
        # pretrained trunk start (reference resnet_finetuning.ipynb cell 7:
        # resnet50(pretrained=True)); the fc head stays freshly initialized,
        # exactly like the reference's replaced head
        from ..models.resnet import load_pretrained_trunk

        trunk_params, trunk_stats = load_pretrained_trunk(args.init_weights)
        params["trunk"] = jax.tree.map(jnp.asarray, trunk_params)
        batch_stats["trunk"] = jax.tree.map(jnp.asarray, trunk_stats)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    # --mesh: data-parallel fine-tuning over the mesh 'data' axis. Params /
    # optimizer state replicate; batches shard on axis 0; GSPMD turns the
    # batch reductions (BN statistics, BCE mean, grads) into global
    # collectives, so the math is the single-device step's (reduction order
    # aside). The export pass stays unsharded (variable-length tails).
    from .common import mesh_from_args

    mesh = mesh_from_args(args)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        n_data = int(mesh.shape["data"])
        if args.batch_size % n_data:
            raise SystemExit(f"--mesh: batch size {args.batch_size} not a "
                             f"multiple of the data axis ({n_data})")
        rep = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P("data"))
        params, batch_stats, opt_state = jax.device_put(
            (params, batch_stats, opt_state), rep)

        def put_batch(a):
            return jax.device_put(jnp.asarray(a), dsh)
    else:
        def put_batch(a):
            return jnp.asarray(a)

    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    def preprocess(x):
        return (x.astype(jnp.float32) / 255.0 - mean_j) / std_j

    from ..data.augment import augment_batch

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, labels, mask, key):
        # on-device augmentation (reference image_train_transform:
        # jitter/rotate/crop/flip, resnet_finetuning.ipynb cell 4) with the
        # /255 + standardization fused into its channel-first domain
        if args.augment:
            pix = augment_batch(key, imgs.astype(jnp.float32),
                                normalize=(mean_j, std_j))
        else:
            pix = preprocess(imgs)

        def loss_fn(p):
            if args.freeze_bn:
                # BN on running stats (torch's trunk.eval() fine-tune
                # idiom): all params still train, the per-batch stat
                # passes — measured ~5 ms of the 12.7 ms step, the
                # bandwidth floor of 53 BN layers' activations — drop out.
                # OFF by default: the reference fine-tunes with train-mode
                # BN (resnet_finetuning.ipynb cell 6).
                logits = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    pix, train=False,
                )
                return bce_with_logits(logits, labels, mask), batch_stats
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                pix, train=True, mutable=["batch_stats"],
            )
            return bce_with_logits(logits, labels, mask), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, imgs, labels, mask):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             preprocess(imgs), train=False)
        preds = (jax.nn.sigmoid(logits.reshape(-1)) > 0.5).astype(jnp.int32)
        return confusion_matrix(labels, preds, 2, mask)

    best_acc, best = -1.0, None
    aug_key = jax.random.key(args.seed)
    for epoch in range(args.n_epochs):
        t0 = time.time()
        for imgs, labels, mask in _batches(train_imgs, train_labels,
                                           args.batch_size, True,
                                           args.seed + epoch):
            aug_key, sk = jax.random.split(aug_key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, put_batch(imgs),
                put_batch(labels), put_batch(mask), sk,
            )
        cm = np.zeros((2, 2), np.int64)
        for imgs, labels, mask in _batches(test_imgs, test_labels,
                                           args.batch_size, False, 0):
            cm += np.asarray(eval_step(params, batch_stats, put_batch(imgs),
                                       put_batch(labels), put_batch(mask)))
        acc = metrics_from_cm(cm, "binary")["accuracy"]
        tracker.log_metrics({f"{fold_name}_loss": float(loss),
                             f"{fold_name}_test_acc": acc}, step=epoch)
        print(f"[{fold_name}] epoch {epoch} acc={acc:.3f} "
              f"({time.time() - t0:.1f}s)")
        if acc > best_acc:
            best_acc = acc
            best = jax.device_get({"params": params, "batch_stats": batch_stats})

    save_checkpoint(tracker.checkpoint_path(f"resnet50_{fold_name}.npz"),
                    best["params"], best["batch_stats"],
                    meta={"mean": mean.tolist(), "std": std.tolist(),
                          "best_acc": best_acc})

    # feature export: head -> Identity (trunk output). --int8-trunk swaps
    # in the post-training-quantized serving trunk (ops/quant.py): measured
    # 6.88 vs 9.43 ms per 128-frame batch on TPU v5e (1.37x past the
    # bandwidth-bound bf16 floor), features within documented PTQ drift of
    # the fp trunk. Opt-in, serving/export only — training and parity paths
    # never touch it.
    if args.int8_trunk:
        from ..ops.quant import quantize_resnet50_trunk, resnet50_int8_apply

        qt = quantize_resnet50_trunk(
            {"params": best["params"]["trunk"],
             "batch_stats": best["batch_stats"]["trunk"]},
            preprocess(jnp.asarray(
                train_imgs[: min(32, len(train_imgs))], jnp.float32)),
        )

        @jax.jit
        def features(imgs):
            return resnet50_int8_apply(qt, preprocess(imgs))
    else:
        @jax.jit
        def features(imgs):
            return model.apply(
                {"params": best["params"], "batch_stats": best["batch_stats"]},
                preprocess(imgs), train=False, method="features",
            )

    out_dir = os.path.join(args.output_root, fold_name)
    os.makedirs(out_dir, exist_ok=True)
    for trial in train_trials + test_trials:
        feats = []
        for s in range(0, trial.n_frames, args.batch_size):
            feats.append(np.asarray(features(jnp.asarray(
                trial.image_feats[s : s + args.batch_size]))))
        save_trial_npz(
            os.path.join(out_dir, trial.name + ".npz"),
            Trial(trial.name, np.concatenate(feats), trial.kinematics,
                  trial.g_labels, trial.e_labels, trial.frames),
        )
    for csv in ("train.csv", "test.csv"):
        with open(os.path.join(fold_dir, csv)) as f_in, open(
            os.path.join(out_dir, csv), "w"
        ) as f_out:
            f_out.write(f_in.read())
    return best_acc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True, help="raw-frame fold dirs")
    p.add_argument("--output-root", required=True, help="feature fold output")
    p.add_argument("--folds", default="1Out,2Out,3Out,4Out,5Out")
    p.add_argument("--runs-root", default="runs")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--n-epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--augment", action="store_true", default=True)
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--mesh", default=None,
                   help="device mesh for data-parallel fine-tuning: 'auto' "
                        "or 'N[,M]' (batch must divide by the data axis)")
    p.add_argument("--int8-trunk", action="store_true", default=False,
                   help="export features through the int8 PTQ serving "
                        "trunk (ops/quant.py; 1.37x the bf16 trunk on "
                        "v5e, documented drift). Serving-only knob")
    p.add_argument("--bn-stat-stride", type=int, default=1,
                   help="ghost-batch BN: train-mode statistics from the "
                        "first batch/N images (models/resnet.py::"
                        "SubsampledBatchNorm). 1 = exact BatchNorm "
                        "(reference parity, default)")
    p.add_argument("--freeze-bn", action="store_true", default=False,
                   help="BatchNorm uses running statistics during training "
                        "(torch trunk.eval() idiom); all params still "
                        "train. Deviates from the reference's train-mode "
                        "BN — a perf knob, not the parity default")
    p.add_argument("--init-weights", default=None,
                   help="torchvision-format resnet50 weights (.pth/.pt/.npz) "
                        "to start the trunk from (the reference starts from "
                        "ImageNet pretrained weights)")
    args = p.parse_args(argv)

    tracker = RunTracker(root=args.runs_root, experiment="ResNet50_finetune")
    tracker.log_params(vars(args))
    for fold in args.folds.split(","):
        acc = finetune_fold(os.path.join(args.data_root, fold), args, tracker,
                            fold)
        print(f"fold {fold}: best acc {acc:.3f}")


if __name__ == "__main__":
    main()
