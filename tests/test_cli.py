"""CLI driver integration tests on a synthetic fold (staged pipelines
included: binary stage -> sequential stage, two runs -> ensemble)."""

import json
import os

import numpy as np
import pytest

from med_tpu.cli.common import base_parser, config_from_args
from med_tpu.cli import (
    ensemble as cli_ensemble,
    train_window as cli_tw,
    train_window_es_sequential as cli_seq,
)
from med_tpu.cli.common import run_frame_folds, run_window_folds
from tests.test_end_to_end import make_synth_fold

pytestmark = pytest.mark.slow  # CLI / convergence tests; skip via -m 'not slow'


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("data")
    fold = make_synth_fold(root, rng, n_trials=4, frames_per_trial=140)
    dst = root / "1Out"
    os.rename(fold, dst)
    return str(root)


def _args(parser, data_root, runs_root, extra=()):
    return parser.parse_args(
        ["--data-root", data_root, "--folds", "1Out", "--runs-root", runs_root,
         "--n-epochs", "2", "--batch-size", "32", *extra]
    )


def test_train_window_cli(data_root, tmp_path):
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs)
    cfg = config_from_args(args, error_type="global", dataset_type="window",
                           out_features=1)
    results, tracker = run_window_folds(args, cfg)
    assert "1Out" in results
    art = os.path.join(tracker.dir, "artifacts", "best_model_LOSO_1Out.json")
    with open(art) as f:
        dump = json.load(f)
    assert "preds" in dump and "probs" in dump and "subjects" in dump
    assert os.path.exists(
        os.path.join(tracker.dir, "checkpoints", "best_model_LOSO_1Out.npz")
    )
    assert os.path.exists(os.path.join(tracker.dir, "artifacts", "summary.json"))


def test_sequential_window_pipeline(data_root, tmp_path):
    runs = str(tmp_path / "runs")
    # stage 1: binary LSTM
    p = base_parser("t")
    args1 = _args(p, data_root, runs, ("--model-name", "SimpleLSTM"))
    cfg1 = config_from_args(args1, error_type="global", dataset_type="window",
                            out_features=1)
    _, tr1 = run_window_folds(args1, cfg1)

    # stage 2: sequential 5-class gated by stage-1 predictions
    p2 = base_parser("t")
    args2 = _args(
        p2, data_root, runs,
        ("--model-name", "SimpleCNN", "--run-id", tr1.run_id, "--delete-nd"),
    )
    cfg2 = config_from_args(args2, error_type="sequential",
                            dataset_type="window", out_features=5)
    results, tr2 = run_window_folds(
        args2, cfg2, extras_fn=cli_seq._gate_fn(args2, cfg2)
    )
    best = results["1Out"]
    assert best["cm"].shape == (6, 6)


def test_frame_cli_and_ensemble(data_root, tmp_path, capsys):
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    # two binary frame runs (TeCNo kinematics) -> soft vote
    run_ids = []
    for seed in (0, 1):
        args = _args(p, data_root, runs,
                     ("--model-name", "TeCNo", "--data-type", "kinematics",
                      "--mstcn-layers", "3", "--mstcn-f-maps", "8",
                      "--seed", str(seed), "--no-lr-scheduler"))
        cfg = config_from_args(args, error_type="global", dataset_type="frame",
                               out_features=2, batch_size=1)
        _, tr = run_frame_folds(args, cfg)
        run_ids.append(tr.run_id)
        assert os.path.exists(
            os.path.join(tr.dir, "artifacts", "windowed_metrics.json")
        )

    cli_ensemble.main(
        ["--runs-root", runs, "--folds", "1Out", "--mode", "soft_vote",
         "--run-a", run_ids[0], "--run-b", run_ids[1]]
    )
    out = capsys.readouterr().out
    assert "soft_vote binary F1" in out


@pytest.fixture(scope="module")
def two_fold_root(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("data2")
    for i, out in enumerate(("1Out", "2Out")):
        fold = make_synth_fold(root, rng, n_trials=3 + i,
                               frames_per_trial=140)
        os.rename(fold, root / out)
    return str(root)


def test_fold_parallel_cli_matches_sequential(two_fold_root, tmp_path):
    """--fold-parallel --mesh: both LOSO folds trained as ONE sharded
    program produce the same artifacts as the sequential driver (pred
    agreement / metric tolerance as test_parallel.py — vmapped matmuls
    reduce in a different order, fp32 noise compounds over Adam steps)."""
    runs = str(tmp_path / "runs")
    folds = "1Out,2Out"

    def run(extra):
        p = base_parser("t")
        args = p.parse_args(
            ["--data-root", two_fold_root, "--folds", folds,
             "--runs-root", runs, "--n-epochs", "2", "--batch-size", "32",
             *extra])
        cfg = config_from_args(args, error_type="global",
                               dataset_type="window", out_features=1)
        return run_window_folds(args, cfg)

    res_seq, _ = run(())
    res_par, tr_par = run(("--fold-parallel", "--mesh", "2,1"))

    for out in ("1Out", "2Out"):
        a = np.asarray(res_seq[out]["preds"])
        b = np.asarray(res_par[out]["preds"])
        assert a.shape == b.shape
        assert np.mean(a == b) > 0.99
        assert res_par[out]["test_f1"] == pytest.approx(
            res_seq[out]["test_f1"], abs=5e-3)
        np.testing.assert_allclose(
            np.asarray(res_par[out]["cm"]), np.asarray(res_seq[out]["cm"]),
            atol=max(2, 0.01 * a.size))
        tag = f"LOSO_{out}"
        assert os.path.exists(
            os.path.join(tr_par.dir, "checkpoints", f"best_model_{tag}.npz"))
        assert os.path.exists(
            os.path.join(tr_par.dir, "artifacts", f"best_model_{tag}.json"))
    assert os.path.exists(os.path.join(tr_par.dir, "artifacts",
                                       "summary.json"))


def test_trial_dp_cli_matches_single_device(data_root, tmp_path):
    """--trial-dp --mesh: the stacked trial_batch axis sharded over the
    mesh 'data' axis reproduces the single-device per-epoch loop."""
    runs = str(tmp_path / "runs")

    def run(extra):
        p = base_parser("t")
        args = p.parse_args(
            ["--data-root", data_root, "--folds", "1Out",
             "--runs-root", runs, "--n-epochs", "2", "--batch-size", "32",
             "--model-name", "TeCNo", "--data-type", "kinematics",
             "--mstcn-layers", "3", "--mstcn-f-maps", "8",
             "--trial-batch", "2", "--no-fused-epoch", "--no-fused-run",
             *extra])
        cfg = config_from_args(args, error_type="global",
                               dataset_type="frame", out_features=2,
                               batch_size=1)
        return run_frame_folds(args, cfg)

    res_seq, _ = run(())
    res_dp, _ = run(("--trial-dp", "--mesh", "2,1"))
    a = np.asarray(res_seq["1Out"]["preds"])
    b = np.asarray(res_dp["1Out"]["preds"])
    assert a.shape == b.shape
    assert np.mean(a == b) > 0.99
    assert res_dp["1Out"]["test_f1"] == pytest.approx(
        res_seq["1Out"]["test_f1"], abs=5e-3)


def test_serve_cli_on_mesh(data_root, tmp_path, capsys):
    """--serve: live fused soft-vote ensemble from stored checkpoints with
    the window batch sharded over the mesh (eval/serving.py mesh path)."""
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs)
    cfg = config_from_args(args, error_type="global", dataset_type="window",
                           out_features=1)
    _, tr = run_window_folds(args, cfg)
    capsys.readouterr()
    cli_ensemble.main(
        ["--runs-root", runs, "--folds", "1Out", "--mode", "soft_vote",
         "--run-a", tr.run_id, "--run-b", tr.run_id,
         "--serve", "--data-root", data_root, "--mesh", "4,2"])
    out = capsys.readouterr().out
    assert "serving mesh" in out
    assert "serve soft_vote binary F1" in out


def test_serve_cli_int8_fe(data_root, tmp_path, capsys):
    """--serve --int8-fe: members run through the int8 PTQ FeatureExtractor
    calibrated on the train split (serving-only extra)."""
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs)
    cfg = config_from_args(args, error_type="global", dataset_type="window",
                           out_features=1)
    _, tr = run_window_folds(args, cfg)
    capsys.readouterr()
    cli_ensemble.main(
        ["--runs-root", runs, "--folds", "1Out", "--mode", "soft_vote",
         "--run-a", tr.run_id, "--run-b", tr.run_id,
         "--serve", "--data-root", data_root, "--int8-fe"])
    out = capsys.readouterr().out
    assert "serve soft_vote binary F1" in out


def test_serve_cli_from_pixels(data_root, tmp_path, capsys):
    """--serve --pixels-root: live pixels -> trunk -> windows -> ensemble
    with a fine-tune-format ResNet checkpoint; no offline feature export."""
    import jax
    import jax.numpy as jnp

    from med_tpu.data.trials import Trial, save_trial_npz
    from med_tpu.models.resnet import ResNet50
    from med_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(3)
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs)
    cfg = config_from_args(args, error_type="global", dataset_type="window",
                           out_features=1)
    _, tr = run_window_folds(args, cfg)

    # raw-frame fold (32x32 pixels; g constant so windows are emitted)
    raw_root = tmp_path / "raw"
    fold = raw_root / "1Out"
    fold.mkdir(parents=True)
    names = []
    for i in range(3):
        name = f"Needle_Passing_B00{i + 1}"
        names.append(name + ".npz")
        T = 40
        imgs = rng.integers(0, 256, size=(T, 32, 32, 3)).astype(np.float32)
        e = np.zeros((T, 5), np.int64)
        e[rng.random(T) < 0.4, 4] = 1
        kin = rng.normal(size=(T, 26)).astype(np.float32)
        save_trial_npz(str(fold / names[-1]),
                       Trial(name, imgs, kin, np.ones(T, np.int64), e))
    with open(fold / "train.csv", "w") as f:
        f.write("\n".join(names[:-1]))
    with open(fold / "test.csv", "w") as f:
        f.write(names[-1])

    # fine-tune-format checkpoint: random full-geometry trunk + pixel stats
    variables = ResNet50().init(jax.random.key(0),
                                jnp.zeros((1, 32, 32, 3)))
    ckpt = str(tmp_path / "resnet50_{fold}.npz")
    save_checkpoint(ckpt.format(fold="1Out"),
                    {"trunk": variables["params"]},
                    {"trunk": variables["batch_stats"]},
                    meta={"mean": [0.5] * 3, "std": [0.25] * 3})

    capsys.readouterr()
    cli_ensemble.main(
        ["--runs-root", runs, "--folds", "1Out", "--mode", "soft_vote",
         "--run-a", tr.run_id, "--run-b", tr.run_id,
         "--serve", "--pixels-root", str(raw_root), "--resnet-ckpt", ckpt,
         "--fp32-trunk", "--serve-batch-size", "8"])
    out = capsys.readouterr().out
    assert "pixel-serve soft_vote binary F1" in out
    assert "trunk=fp32" in out


def test_siamese_cli(data_root, tmp_path):
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs,
                 ("--model-name", "Siamese_CNN", "--n-pairs", "128",
                  "--n-comparisons", "3"))
    cfg = config_from_args(args, error_type="global", dataset_type="window",
                           out_features=1).replace(siamese=True)
    results, _ = run_window_folds(
        args, cfg, siamese_fn=cli_tw._siamese_data_fn(cfg)
    )
    best = results["1Out"]
    assert "vote_preds" in best or best["cm"].shape == (2, 2)


def test_tsvn_staged_pipeline(data_root, tmp_path):
    """TeCNo stage-1 -> frozen -> TransSVNet stage-2 via --run-id."""
    from med_tpu.cli import train_frame as cli_tf

    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args1 = _args(p, data_root, runs,
                  ("--model-name", "TeCNo", "--data-type", "kinematics",
                   "--mstcn-layers", "3", "--mstcn-f-maps", "8",
                   "--no-lr-scheduler"))
    cfg1 = config_from_args(args1, error_type="global", dataset_type="frame",
                            out_features=2, batch_size=1)
    _, tr1 = run_frame_folds(args1, cfg1)

    p2 = base_parser("t")
    args2 = _args(p2, data_root, runs,
                  ("--model-name", "TransSVNet", "--data-type", "kinematics",
                   "--mstcn-layers", "3", "--mstcn-f-maps", "8",
                   "--sequence-length", "6", "--run-id", tr1.run_id,
                   "--no-lr-scheduler"))
    cfg2 = config_from_args(args2, error_type="global", dataset_type="frame",
                            out_features=2, batch_size=1)
    results, _ = run_frame_folds(args2, cfg2, frozen_fn=cli_tf._frozen_fn(args2))
    assert 0 <= results["1Out"]["test_f1"] <= 1


def test_cog_cli(data_root, tmp_path):
    runs = str(tmp_path / "runs")
    p = base_parser("t")
    args = _args(p, data_root, runs,
                 ("--model-name", "COG", "--data-type", "kinematics",
                  "--num-layers-basic", "2", "--num-layers-r", "2",
                  "--num-r", "1", "--mstcn-stages", "3", "--d-model", "16",
                  "--d-q", "2", "--sequence-length", "6",
                  "--no-lr-scheduler", "--no-use-pallas"))
    cfg = config_from_args(args, error_type="global", dataset_type="frame",
                           out_features=2, batch_size=1)
    results, tr = run_frame_folds(args, cfg)
    assert "1Out" in results
    import os
    assert os.path.exists(os.path.join(tr.dir, "artifacts",
                                       "windowed_metrics.json"))


def _fake_run(runs_root, run_id, rng, folds=("1Out", "2Out"), acc=0.8,
              n=120, labels=None):
    """Synthetic stored run: artifact dumps with the engine's dump schema
    (labels/preds/probs/raw_labels/subjects/gestures), no training.
    ``labels``: shared per-fold ground truth so two runs are positionally
    aligned (the overlap analysis requires it)."""
    from med_tpu.config import RAW_ERROR_COLUMNS

    d = os.path.join(runs_root, "exp", run_id, "artifacts")
    os.makedirs(d, exist_ok=True)
    for fold in folds:
        y = rng.integers(0, 2, n) if labels is None else labels[fold]
        flip = rng.random(n) > acc
        preds = np.where(flip, 1 - y, y)
        raw = np.zeros((n, len(RAW_ERROR_COLUMNS)), int)
        raw[:, -1] = y
        dump = {
            "labels": y.tolist(),
            "preds": preds.tolist(),
            "probs": np.clip(preds * 0.8 + 0.1 + rng.normal(0, 0.05, n),
                             0, 1).tolist(),
            "raw_labels": raw.tolist(),
            "subjects": ["s"] * n,
            "gestures": [1] * n,
        }
        with open(os.path.join(d, f"best_model_LOSO_{fold}.json"), "w") as f:
            json.dump(dump, f)
    return run_id


def test_results_cli(tmp_path, capsys):
    """The results-analysis driver (reference notebooks/results.ipynb):
    comparison table, per-error-type F1, majority baseline, paired t-test,
    overlap and probability histograms over stored runs."""
    from med_tpu.cli import results as cli_results

    rng = np.random.default_rng(3)
    runs = str(tmp_path / "runs")
    labels = {f: rng.integers(0, 2, 120) for f in ("1Out", "2Out")}
    a = _fake_run(runs, "runA", rng, acc=0.9, labels=labels)
    b = _fake_run(runs, "runB", rng, acc=0.7, labels=labels)
    base = ["--runs-root", runs, "--folds", "1Out,2Out"]

    cli_results.main(["table", *base, "--run", f"cnn/video={a}",
                      "--run", f"cnn/kin={b}"])
    out = capsys.readouterr().out
    assert "cnn/video" in out and "F1" in out and "±" in out

    cli_results.main(["errors", *base, "--run-id", a])
    out = capsys.readouterr().out
    assert "per-error-type F1 [Error]" in out

    cli_results.main(["majority", *base, "--run-id", a])
    out = capsys.readouterr().out
    assert "majority baseline f1" in out

    cli_results.main(["ttest", *base, "--run-a", a, "--run-b", b])
    out = capsys.readouterr().out
    assert "paired t-test: t=" in out

    cli_results.main(["overlap", *base, "--run-a", a, "--run-b", b])
    out = capsys.readouterr().out
    assert "overlap: both=" in out

    img = str(tmp_path / "h.png")
    cli_results.main(["hist", *base, "--run-id", a, "--out-image", img])
    assert os.path.exists(img)
