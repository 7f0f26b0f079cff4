"""ResNet fine-tune driver integration test on a tiny raw-frame fold."""

import os

import numpy as np
import pytest

from med_tpu.cli import resnet_finetune
from med_tpu.data.trials import Trial, save_trial_npz

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


def make_raw_fold(tmp_path, rng, n_trials=3, frames=16, hw=32):
    fold = tmp_path / "1Out"
    fold.mkdir(parents=True)
    names = []
    for i in range(n_trials):
        name = f"Needle_Passing_B00{i + 1}"
        names.append(name + ".npz")
        T = frames
        imgs = rng.integers(0, 256, size=(T, hw, hw, 3)).astype(np.uint8)
        e = np.zeros((T, 5), np.int64)
        e[: T // 2, 4] = 1
        imgs[: T // 2] //= 2  # learnable brightness signal
        kin = rng.normal(size=(T, 26)).astype(np.float32)
        g = np.ones(T, np.int64)
        save_trial_npz(str(fold / names[-1]), Trial(name, imgs.astype(np.float32), kin, g, e))
    with open(fold / "train.csv", "w") as f:
        f.write("\n".join(names[:-1]))
    with open(fold / "test.csv", "w") as f:
        f.write(names[-1])
    return str(tmp_path)


def fake_torchvision_sd(rng):
    """Random weights in torchvision resnet50 state_dict layout (the image
    has no torchvision; only the key/shape contract matters)."""
    sd = {}

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".running_var"] = (rng.random(c) + 0.5).astype(np.float32)

    def conv(prefix, cout, cin, k):
        sd[prefix + ".weight"] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32) * 0.05

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    c_in = 64
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        w = 64 * 2 ** stage
        for block in range(n_blocks):
            src = f"layer{stage + 1}.{block}"
            conv(f"{src}.conv1", w, c_in, 1)
            bn(f"{src}.bn1", w)
            conv(f"{src}.conv2", w, w, 3)
            bn(f"{src}.bn2", w)
            conv(f"{src}.conv3", w * 4, w, 1)
            bn(f"{src}.bn3", w * 4)
            if block == 0:
                conv(f"{src}.downsample.0", w * 4, c_in, 1)
                bn(f"{src}.downsample.1", w * 4)
            c_in = w * 4
    return sd


def test_load_pretrained_trunk_roundtrip(tmp_path, rng):
    """load_pretrained_trunk maps a torchvision-layout .pth into ResNet50
    variables that the model accepts, with exact value round-trip."""
    import torch

    from med_tpu.models.resnet import ResNet50, load_pretrained_trunk

    sd = fake_torchvision_sd(rng)
    path = str(tmp_path / "resnet50.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    params, stats = load_pretrained_trunk(path)
    np.testing.assert_array_equal(
        params["conv1"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        stats["layer3_2"]["bn2"]["mean"], sd["layer3.2.bn2.running_mean"])
    # the tree drops into the model without shape errors
    import jax.numpy as jnp

    out = ResNet50().apply({"params": params, "batch_stats": stats},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 2048)


def test_resnet_finetune_with_init_weights(tmp_path, rng):
    """--init-weights starts the trunk from the imported weights (reference
    pretrained=True start, resnet_finetuning.ipynb cell 7)."""
    import torch

    sd = fake_torchvision_sd(rng)
    wpath = str(tmp_path / "imagenet.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, wpath)
    data_root = make_raw_fold(tmp_path / "raw", rng, n_trials=2, frames=8)
    out_root = str(tmp_path / "features")
    resnet_finetune.main(
        ["--data-root", data_root, "--output-root", out_root,
         "--folds", "1Out", "--runs-root", str(tmp_path / "runs"),
         "--batch-size", "4", "--n-epochs", "1", "--no-augment",
         "--init-weights", wpath]
    )
    from med_tpu.data.trials import load_fold

    img, kin, g, e, subj = load_fold(os.path.join(out_root, "1Out"), "test.csv")
    assert img.shape == (8, 2048)


def test_resnet_finetune_freeze_bn(tmp_path, rng):
    """--freeze-bn trains on running BN statistics: the driver completes,
    exports features, and the stored batch_stats equal the init values
    (never mutated by training)."""
    import glob

    data_root = make_raw_fold(tmp_path / "raw", rng, n_trials=2, frames=8)
    out_root = str(tmp_path / "features")
    runs_root = str(tmp_path / "runs")
    resnet_finetune.main(
        ["--data-root", data_root, "--output-root", out_root,
         "--folds", "1Out", "--runs-root", runs_root,
         "--batch-size", "4", "--n-epochs", "1", "--no-augment",
         "--freeze-bn"]
    )
    from med_tpu.data.trials import load_fold
    from med_tpu.train.checkpoint import load_checkpoint

    img, _, _, _, _ = load_fold(os.path.join(out_root, "1Out"), "test.csv")
    assert img.shape == (8, 2048)
    ckpt = glob.glob(os.path.join(runs_root, "**", "resnet50_1Out.npz"),
                     recursive=True)
    stats = load_checkpoint(ckpt[0])["batch_stats"]
    # flax inits BN running stats to mean 0 / var 1; frozen they stay there
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(stats):
        key = jax.tree_util.keystr(path)
        expect = 1.0 if "var" in key else 0.0
        np.testing.assert_allclose(np.asarray(leaf), expect, err_msg=key)


def test_resnet_finetune_and_export(tmp_path, rng):
    data_root = make_raw_fold(tmp_path / "raw", rng)
    out_root = str(tmp_path / "features")
    resnet_finetune.main(
        ["--data-root", data_root, "--output-root", out_root,
         "--folds", "1Out", "--runs-root", str(tmp_path / "runs"),
         "--batch-size", "8", "--n-epochs", "1"]
    )
    # exported features are standard trial files
    from med_tpu.data.trials import load_fold

    img, kin, g, e, subj = load_fold(os.path.join(out_root, "1Out"), "test.csv")
    assert img.shape == (16, 2048)
    assert kin.shape == (16, 26)


def test_resnet_finetune_int8_export(tmp_path, rng):
    """--int8-trunk: features exported through the PTQ int8 serving trunk
    stay directionally faithful to the fp export (the TPU A/B measured
    1.37x past the bf16 floor at cosine 0.9999; here we pin the wiring +
    drift on CPU)."""
    data_root = make_raw_fold(tmp_path / "raw", rng, n_trials=2, frames=8)
    runs_root = str(tmp_path / "runs")
    base = ["--data-root", data_root, "--folds", "1Out",
            "--runs-root", runs_root, "--batch-size", "4", "--n-epochs", "1",
            "--no-augment", "--seed", "0"]
    out_fp = str(tmp_path / "feat_fp")
    out_i8 = str(tmp_path / "feat_i8")
    resnet_finetune.main([*base, "--output-root", out_fp])
    resnet_finetune.main([*base, "--output-root", out_i8, "--int8-trunk"])

    from med_tpu.data.trials import load_fold

    fp, *_ = load_fold(os.path.join(out_fp, "1Out"), "test.csv")
    i8, *_ = load_fold(os.path.join(out_i8, "1Out"), "test.csv")
    assert fp.shape == i8.shape == (8, 2048)
    cos = np.sum(fp * i8, -1) / (
        np.linalg.norm(fp, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-12)
    assert cos.min() > 0.98, cos
    # and it is genuinely the quantized path, not a silent fp fallback
    assert np.abs(fp - i8).max() > 1e-6


def test_resnet_finetune_mesh_dp_matches_single(tmp_path, rng):
    """--mesh 2,1: data-parallel fine-tuning (batch sharded over the mesh
    'data' axis, params replicated, GSPMD global BN/loss/grad reductions)
    has the single-device semantics.

    Parity is pinned at lr=0 (forward + BN running-stat evolution, tight):
    at a real lr the comparison is chaotic BY CONSTRUCTION, not by bug —
    Adam's step-1 update is ~lr*sign(g) from a random-init trunk, so
    reduction-order epsilons flip near-zero grad signs and diverge the
    random trunk (measured cosine ~0.95 after 2 steps on BOTH orderings of
    the same math); the lr>0 leg asserts the mesh run trains and exports
    sane features."""
    data_root = make_raw_fold(tmp_path / "raw", rng, n_trials=2, frames=8)
    base = ["--data-root", data_root, "--folds", "1Out", "--batch-size", "4",
            "--n-epochs", "1", "--no-augment", "--seed", "0"]

    from med_tpu.data.trials import load_fold

    # lr=0: stats-only evolution must match tightly across shardings
    out_a = str(tmp_path / "feat_single")
    out_b = str(tmp_path / "feat_mesh")
    resnet_finetune.main([*base, "--lr", "0.0", "--output-root", out_a,
                          "--runs-root", str(tmp_path / "runs_a")])
    resnet_finetune.main([*base, "--lr", "0.0", "--output-root", out_b,
                          "--runs-root", str(tmp_path / "runs_b"),
                          "--mesh", "2,1"])
    fa, *_ = load_fold(os.path.join(out_a, "1Out"), "test.csv")
    fb, *_ = load_fold(os.path.join(out_b, "1Out"), "test.csv")
    assert fa.shape == fb.shape == (8, 2048)
    np.testing.assert_allclose(fa, fb, rtol=2e-3, atol=2e-3)

    # real lr on the mesh: trains end-to-end, finite sane export
    out_c = str(tmp_path / "feat_mesh_lr")
    resnet_finetune.main([*base, "--output-root", out_c,
                          "--runs-root", str(tmp_path / "runs_c"),
                          "--mesh", "2,1"])
    fc, *_ = load_fold(os.path.join(out_c, "1Out"), "test.csv")
    assert np.isfinite(fc).all() and np.abs(fc).max() > 0
