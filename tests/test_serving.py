"""Live ensemble serving: fused jit program matches the offline fusion rules
and runs sharded over the mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from med_tpu.config import ExperimentConfig
from med_tpu.eval.serving import EnsembleServer, WindowModelBundle
from med_tpu.parallel import make_mesh
from med_tpu.train.engine import Experiment


def make_bundle(rng, seed, data_type="multimodal"):
    cfg = ExperimentConfig(model_name="SimpleCNN", data_type=data_type,
                           use_pallas=False)
    exp = Experiment(cfg)
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 10, 2048)), jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(8, 10, 26)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, 8)),
        "mask": jnp.ones(8, jnp.float32),
    }
    state = exp.init_state(jax.random.key(seed), batch)
    ckpt = jax.device_get({"params": state.params,
                           "batch_stats": state.batch_stats})
    return WindowModelBundle(cfg, ckpt)


def test_soft_vote_server_matches_members(rng):
    a = make_bundle(rng, 0)
    b = make_bundle(rng, 1, data_type="kinematics")
    server = EnsembleServer([a, b], mode="soft_vote")
    B = 16
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, p = server.predict(images, kin)
    pa = jax.nn.sigmoid(a.logits(jnp.asarray(images), jnp.asarray(kin)).reshape(-1))
    pb = jax.nn.sigmoid(b.logits(jnp.asarray(images), jnp.asarray(kin)).reshape(-1))
    want_p = (np.asarray(pa) + np.asarray(pb)) / 2
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(preds), (want_p >= 0.5).astype(int))


def test_cascade_server(rng):
    binary = make_bundle(rng, 0)
    cfg_mc = ExperimentConfig(model_name="SimpleCNN", error_type="all_errors",
                              out_features=6, use_pallas=False)
    exp = Experiment(cfg_mc)
    batch = {
        "images": jnp.zeros((8, 10, 2048)),
        "kinematics": jnp.zeros((8, 10, 26)),
        "labels": jnp.zeros(8, jnp.int32),
        "mask": jnp.ones(8, jnp.float32),
    }
    state = exp.init_state(jax.random.key(3), batch)
    multi = WindowModelBundle(cfg_mc, jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}))

    server = EnsembleServer([binary, multi], mode="cascade")
    B = 16
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, bprob = server.predict(images, kin)
    preds = np.asarray(preds)
    bp = np.asarray(bprob)
    assert (preds[bp <= 0.5] == 0).all()


def test_server_on_mesh(rng):
    a = make_bundle(rng, 0)
    server_plain = EnsembleServer([a], mode="soft_vote")
    mesh = make_mesh()
    server = EnsembleServer([a], mode="soft_vote", mesh=mesh)
    B = 32  # divisible by mesh data axis
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    preds, p = server.predict(images, kin)
    preds0, p0 = server_plain.predict(images, kin)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0), atol=1e-6)
    assert preds.shape == (B,)


def _tiny_trunk(rng, *, stage_sizes=(1, 1, 1, 1), width=8):
    """Random-weight tiny ResNet-50 geometry (feature dim 4*width*8)."""
    from med_tpu.models.resnet import ResNet50

    model = ResNet50(stage_sizes, width, jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 40, 40, 3)))
    # non-trivial BN running stats so folding is exercised
    stats = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            rng.normal(size=v.shape), jnp.float32) ** 2,
        variables["batch_stats"])
    return model, variables["params"], stats


def test_pixel_front_end_matches_offline_export(rng):
    """Live pixels->features equals the exporter's model.apply path,
    including the padded last chunk."""
    from med_tpu.eval.serving import PixelFrontEnd

    model, params, stats = _tiny_trunk(rng)
    frames = rng.integers(0, 256, size=(13, 40, 40, 3)).astype(np.uint8)
    mean = rng.uniform(0.3, 0.7, 3).astype(np.float32)
    std = rng.uniform(0.1, 0.3, 3).astype(np.float32)
    fe = PixelFrontEnd(params, stats, mean=mean, std=std,
                       dtype=jnp.float32, stage_sizes=(1, 1, 1, 1),
                       width=8, batch_size=8)
    got = fe.features(frames)
    pix = (frames.astype(np.float32) / 255.0 - mean) / std
    want = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pix), train=False))
    assert got.shape == (13, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pixel_front_end_imagenet_preprocess(rng):
    """Without per-fold pixel stats the front-end falls back to the fused
    ImageNet resize-240/crop-224 graph (jax_preprocess_frames)."""
    from med_tpu.data.preprocessing import jax_preprocess_frames
    from med_tpu.eval.serving import PixelFrontEnd

    model, params, stats = _tiny_trunk(rng)
    frames = rng.integers(0, 256, size=(3, 240, 240, 3)).astype(np.uint8)
    fe = PixelFrontEnd(params, stats, dtype=jnp.float32,
                       stage_sizes=(1, 1, 1, 1), width=8, batch_size=4)
    got = fe.features(frames)
    want = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        jax_preprocess_frames(jnp.asarray(frames, jnp.float32)),
        train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pixel_front_end_int8_close(rng):
    """int8 PTQ front-end stays within documented drift of the fp trunk."""
    from med_tpu.eval.serving import PixelFrontEnd

    model, params, stats = _tiny_trunk(rng)
    frames = rng.integers(0, 256, size=(8, 40, 40, 3)).astype(np.uint8)
    mean = np.full(3, 0.5, np.float32)
    std = np.full(3, 0.25, np.float32)
    kw = dict(mean=mean, std=std, dtype=jnp.float32,
              stage_sizes=(1, 1, 1, 1), width=8, batch_size=8)
    fp = PixelFrontEnd(params, stats, **kw).features(frames)
    q = PixelFrontEnd(params, stats, int8=True, calib_frames=frames,
                      **kw).features(frames)
    cos = np.sum(fp * q, 1) / (
        np.linalg.norm(fp, axis=1) * np.linalg.norm(q, axis=1) + 1e-12)
    assert cos.min() > 0.95


def test_pixel_front_end_from_checkpoint(tmp_path, rng):
    """from_checkpoint: resnet_finetune's npz + meta round-trips (pixel
    stats picked up from the meta json)."""
    from med_tpu.eval.serving import PixelFrontEnd
    from med_tpu.train.checkpoint import save_checkpoint

    model, params, stats = _tiny_trunk(rng)
    mean = rng.uniform(0.3, 0.7, 3).astype(np.float32)
    std = rng.uniform(0.1, 0.3, 3).astype(np.float32)
    path = str(tmp_path / "resnet50_1Out.npz")
    save_checkpoint(path, {"trunk": params, "fc1": {}, "fc2": {}},
                    {"trunk": stats},
                    meta={"mean": mean.tolist(), "std": std.tolist()})
    fe = PixelFrontEnd.from_checkpoint(
        path, dtype=jnp.float32, stage_sizes=(1, 1, 1, 1), width=8,
        batch_size=4)
    frames = rng.integers(0, 256, size=(6, 40, 40, 3)).astype(np.uint8)
    direct = PixelFrontEnd(params, stats, mean=mean, std=std,
                           dtype=jnp.float32, stage_sizes=(1, 1, 1, 1),
                           width=8, batch_size=4)
    np.testing.assert_allclose(fe.features(frames), direct.features(frames),
                               rtol=1e-5, atol=1e-5)


def test_predict_trial_from_pixels_matches_offline_chain(rng):
    """Live pixels->windows->ensemble equals the offline export + windowing
    + standardize + member-forward chain, window for window."""
    from med_tpu.config import ExperimentConfig
    from med_tpu.data.datasets import standardize
    from med_tpu.data.windowing import window_scan
    from med_tpu.eval.serving import PixelFrontEnd, predict_trial_from_pixels

    model, params, stats = _tiny_trunk(rng)
    T = 60
    frames = rng.integers(0, 256, size=(T, 40, 40, 3)).astype(np.uint8)
    kin = rng.normal(size=(T, 26)).astype(np.float32)
    g = np.ones(T, np.int64)
    mean = np.full(3, 0.5, np.float32)
    std = np.full(3, 0.25, np.float32)
    fe = PixelFrontEnd(params, stats, mean=mean, std=std,
                       dtype=jnp.float32, stage_sizes=(1, 1, 1, 1),
                       width=8, batch_size=16)

    cfg = ExperimentConfig(model_name="SimpleCNN", data_type="multimodal",
                           use_pallas=False)
    exp = Experiment(cfg)
    feats = fe.features(frames)
    fold_stats = {
        "image": {"mean": feats.mean(0), "std": feats.std(0) + 1e-8},
        "kinematics": {"mean": kin.mean(0), "std": kin.std(0) + 1e-8},
    }
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, cfg.window_size, 256)),
                              jnp.float32),
        "kinematics": jnp.asarray(rng.normal(size=(8, cfg.window_size, 26)),
                                  jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, 8)),
        "mask": jnp.ones(8, jnp.float32),
    }
    state = exp.init_state(jax.random.key(7), batch)
    bundle = WindowModelBundle(cfg, jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}))
    server = EnsembleServer([bundle], mode="soft_vote")

    starts, preds, probs = predict_trial_from_pixels(
        fe, server, frames, kin, g, cfg, fold_stats)

    want_starts = window_scan(g, cfg.window_size, cfg.stride)
    np.testing.assert_array_equal(starts, want_starts)
    gather = want_starts[:, None] + np.arange(cfg.window_size)[None, :]
    iw = standardize(feats[gather], fold_stats["image"])
    kw = standardize(kin[gather], fold_stats["kinematics"])
    want_p = np.asarray(jax.nn.sigmoid(
        bundle.logits(jnp.asarray(iw), jnp.asarray(kw)).reshape(-1)))
    np.testing.assert_allclose(probs, want_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(preds, (want_p >= 0.5).astype(int))


def test_frame_model_server(rng):
    from med_tpu.eval.serving import FrameModelServer

    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        use_pallas=False,
    )
    exp = Experiment(cfg)
    T = 120
    batch = {
        "images": jnp.zeros((1, 256, 2048)),
        "kinematics": jnp.zeros((1, 256, 26)),
        "labels": jnp.zeros(256, jnp.int32),
        "mask": jnp.ones(256, jnp.float32),
        "true_len": jnp.asarray(256, jnp.int32),
    }
    state = exp.init_state(jax.random.key(0), batch)
    ckpt = jax.device_get({"params": state.params,
                           "batch_stats": state.batch_stats})
    stats = {"kinematics": {"mean": np.zeros(26, np.float32),
                            "std": np.ones(26, np.float32)}}
    server = FrameModelServer(cfg, ckpt, stats=stats)
    preds, probs = server.predict_trial(
        rng.normal(size=(T, 2048)).astype(np.float32),
        rng.normal(size=(T, 26)).astype(np.float32),
    )
    assert preds.shape == (T,)
    assert probs.shape == (T,)
    assert set(np.unique(preds)) <= {0, 1}


def test_frame_model_server_from_pixels(rng):
    """FrameModelServer x PixelFrontEnd: raw frames through the live trunk
    equal precomputed features through predict_trial."""
    from med_tpu.eval.serving import FrameModelServer, PixelFrontEnd

    # kinematics-only model keeps this cheap; the composition contract is
    # what is under test (features are still produced and threaded)
    cfg = ExperimentConfig(
        model_name="TeCNo", dataset_type="frame", data_type="kinematics",
        out_features=2, batch_size=1, mstcn_layers=3, mstcn_f_maps=8,
        use_pallas=False,
    )
    exp = Experiment(cfg)
    batch = {
        "images": jnp.zeros((1, 256, 256)),
        "kinematics": jnp.zeros((1, 256, 26)),
        "labels": jnp.zeros(256, jnp.int32),
        "mask": jnp.ones(256, jnp.float32),
        "true_len": jnp.asarray(256, jnp.int32),
    }
    state = exp.init_state(jax.random.key(1), batch)
    ckpt = jax.device_get({"params": state.params,
                           "batch_stats": state.batch_stats})
    server = FrameModelServer(cfg, ckpt, stats=None)

    model, params, stats = _tiny_trunk(rng)
    fe = PixelFrontEnd(params, stats, mean=np.full(3, 0.5, np.float32),
                       std=np.full(3, 0.25, np.float32), dtype=jnp.float32,
                       stage_sizes=(1, 1, 1, 1), width=8, batch_size=16)
    T = 50
    frames = rng.integers(0, 256, size=(T, 40, 40, 3)).astype(np.uint8)
    kin = rng.normal(size=(T, 26)).astype(np.float32)
    preds, probs = server.predict_trial_from_pixels(fe, frames, kin)
    want_p, want_pr = server.predict_trial(fe.features(frames), kin)
    np.testing.assert_array_equal(preds, want_p)
    np.testing.assert_allclose(probs, want_pr, rtol=1e-6)


def test_soft_vote_server_int8_fe_close(rng):
    """Members served through the int8 PTQ FeatureExtractor
    (WindowModelBundle.quantize_fe) agree with the fp32 ensemble to the
    documented PTQ tolerance — probabilities close, decisions matching
    except within a band around the threshold (serving-only extra; the
    reference has no quantized path)."""
    B = 32
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)

    ref_members = [make_bundle(rng, 0), make_bundle(rng, 1)]
    ref_server = EnsembleServer(ref_members, mode="soft_vote")
    _, p_ref = ref_server.predict(images, kin)

    i8_members = [make_bundle(rng, 0), make_bundle(rng, 1)]
    for m in i8_members:
        m.quantize_fe(images[:8])
        assert m.qfe is not None
    i8_server = EnsembleServer(i8_members, mode="soft_vote")
    preds, p_i8 = i8_server.predict(images, kin)

    p_ref, p_i8 = np.asarray(p_ref), np.asarray(p_i8)
    np.testing.assert_allclose(p_i8, p_ref, atol=0.03)
    # decisions match wherever the fp32 probability is clear of threshold
    clear = np.abs(p_ref - 0.5) > 0.03
    np.testing.assert_array_equal(
        np.asarray(preds)[clear], (p_ref >= 0.5).astype(int)[clear])


def test_kinematics_member_quantize_fe_noop(rng):
    m = make_bundle(rng, 2, data_type="kinematics")
    m.quantize_fe(rng.normal(size=(4, 10, 2048)).astype(np.float32))
    assert m.qfe is None


def test_server_int8_feature_store_matches_fp32_input(rng):
    """EnsembleServer fed the int8 feature store (quantize_fe_input) gives
    BIT-identical probabilities to the same server fed fp32 windows — the
    store only moves the layer-0 quantize off the serving step."""
    from med_tpu.ops.quant import quantize_fe_input

    B = 16
    images = rng.normal(size=(B, 10, 2048)).astype(np.float32)
    kin = rng.normal(size=(B, 10, 26)).astype(np.float32)
    members = [make_bundle(rng, 0), make_bundle(rng, 1, data_type="kinematics")]
    members[0].quantize_fe(images[:4])
    server = EnsembleServer(members, mode="soft_vote")
    preds_f, p_f = server.predict(images, kin)
    imq = np.asarray(quantize_fe_input(members[0].qfe, images))
    assert imq.dtype == np.int8
    preds_q, p_q = server.predict(imq, kin)
    np.testing.assert_array_equal(np.asarray(p_q), np.asarray(p_f))
    np.testing.assert_array_equal(np.asarray(preds_q), np.asarray(preds_f))
