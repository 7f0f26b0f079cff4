"""Offline-preprocessing semantics tests."""

import numpy as np
import pytest

from med_tpu.data.preprocessing import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    errors_for_frames,
    gestures_for_frames,
    jax_preprocess_frames,
    parse_segment_name,
    preprocess_frames_native,
    process_kinematics_array,
    purge_gestures,
    rotation_matrix_to_euler,
    trim_to_transcript,
)


def rot(x, y, z):
    cx, sx, cy, sy, cz, sz = np.cos(x), np.sin(x), np.cos(y), np.sin(y), np.cos(z), np.sin(z)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def test_euler_roundtrip(rng):
    angles = rng.uniform(-1.4, 1.4, size=(50, 3))
    Rs = np.stack([rot(*a) for a in angles])
    got = rotation_matrix_to_euler(Rs)
    np.testing.assert_allclose(got, angles, atol=1e-8)


def test_euler_singular():
    # gimbal lock: pitch = pi/2 -> sy ~ 0, z forced to 0
    R = rot(0.3, np.pi / 2, 0.0)
    x, y, z = rotation_matrix_to_euler(R)
    assert z == 0.0
    assert y == pytest.approx(np.pi / 2, abs=1e-6)


def test_process_kinematics_layout(rng):
    n = 60
    raw = rng.normal(size=(n, 76))
    # plant identity rotations so Euler = 0
    for base in (41, 60):  # left/right R blocks, 0-based 41..49 / 60..68
        raw[:, base : base + 9] = np.eye(3).ravel()
    feats, frames = process_kinematics_array(raw, frequency=5)
    assert feats.shape == (10, 26)
    np.testing.assert_array_equal(frames, np.arange(1, 61)[::6])
    # left xyz = raw cols 38:41 of the kept rows
    np.testing.assert_allclose(feats[:, 0:3], raw[::6, 38:41], rtol=1e-6)
    np.testing.assert_allclose(feats[:, 3:6], 0, atol=1e-12)   # left rpy
    np.testing.assert_allclose(feats[:, 6:9], raw[::6, 50:53], rtol=1e-6)  # vel
    np.testing.assert_allclose(feats[:, 12], raw[::6, 56], rtol=1e-6)      # grip
    np.testing.assert_allclose(feats[:, 13:16], raw[::6, 57:60], rtol=1e-6)  # right xyz
    np.testing.assert_allclose(feats[:, 25], raw[::6, 75], rtol=1e-6)      # right grip


def test_gestures_and_trim():
    transcript = [(10, 19, 1), (20, 29, 2), (40, 49, 3)]
    frames = np.arange(1, 61)
    g, covered = gestures_for_frames(transcript, frames)
    # frames 10-29 and 40-49 covered
    assert len(g) == 30
    assert (g[:10] == 1).all() and (g[10:20] == 2).all() and (g[20:] == 3).all()
    mask = trim_to_transcript(frames, transcript)
    np.testing.assert_array_equal(mask, (frames >= 10) & (frames <= 49))


def test_errors_for_frames():
    transcript = [(10, 49, 1)]
    frames = np.arange(1, 61)
    segments = {
        "Out_Of_View": [(10, 19, 1)],
        "Error": [(10, 19, 1), (30, 39, 1)],
        "Needle_Drop": [(30, 39, 0)],  # explicitly labeled clean
    }
    e, keep = errors_for_frames(transcript, segments, frames)
    assert e.shape == (40, 5)
    assert (e[:10, 0] == 1).all() and (e[10:, 0] == 0).all()
    assert (e[:10, 4] == 1).all() and (e[20:30, 4] == 1).all()
    assert e[:, 1].sum() == 0
    np.testing.assert_array_equal(keep, (frames >= 10) & (frames <= 49))


def test_parse_segment_name():
    assert parse_segment_name("Needle_Passing_B001_120_480.avi") == (120, 480)


def test_purge_gestures():
    g = np.array([1, 10, 2, 11, 3, 10])
    keep = purge_gestures(g)
    np.testing.assert_array_equal(g[keep], [1, 2, 3])


def test_pixel_pipeline_native_vs_jax(rng):
    # smooth synthetic frames: the native path matches cv2 (no antialias)
    # while jax.image.resize antialiases on downsample, so compare on
    # image-like low-frequency content, not white noise
    yy, xx = np.mgrid[0:480, 0:640]
    base = (
        127 + 80 * np.sin(xx / 40.0) * np.cos(yy / 60.0)
        + 40 * np.sin((xx + yy) / 90.0)
    )
    frames = np.stack(
        [np.stack([base + 10 * c + 5 * k for c in range(3)], axis=-1)
         for k in range(2)]
    ).clip(0, 255).astype(np.uint8)
    native = preprocess_frames_native(frames)
    if native is None:
        pytest.skip("native lib unavailable")
    assert native.shape == (2, 224, 224, 3)
    jx = np.asarray(jax_preprocess_frames(frames))
    assert jx.shape == (2, 224, 224, 3)
    # same pipeline up to resize-kernel details; outputs highly correlated
    corr = np.corrcoef(native.ravel(), jx.ravel())[0, 1]
    assert corr > 0.98
    # normalization exactness: mean/std applied identically to same pixels
    un_native = native * IMAGENET_STD + IMAGENET_MEAN
    assert un_native.min() >= -1e-4 and un_native.max() <= 1.0 + 1e-4


def test_subsample_stream_semantics():
    """Reference keep rule (preprocessing_utils.py:59-64): 1-based
    frame_count % (30/frequency) == 1, float modulo."""
    from med_tpu.data.preprocessing import subsample_stream

    frames = list(range(100, 160))  # 60 synthetic "frames"
    kept5 = list(subsample_stream(frames, 5))      # step 6.0 -> counts 1,7,13,…
    assert [c for c, _ in kept5] == list(range(1, 61, 6))
    assert [f for _, f in kept5] == frames[::6]
    kept6 = [c for c, _ in subsample_stream(frames, 6)]   # step 5.0
    assert kept6 == list(range(1, 61, 5))
    kept30 = list(subsample_stream(frames, 30))
    assert len(kept30) == 60 and kept30[0] == (1, 100)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(subsample_stream(frames, 60))


def test_decode_preprocess_batches_stream(rng):
    """Double-buffered decode->preprocess stream on a synthetic frame
    source: batching, tail handling, and parity with the one-shot fused
    preprocess graph."""
    import jax.numpy as jnp

    from med_tpu.data.preprocessing import (
        decode_preprocess_batches,
        jax_preprocess_frames,
    )

    frames = rng.integers(0, 256, size=(10, 120, 160, 3)).astype(np.uint8)
    got = list(decode_preprocess_batches(
        path="unused", batch=4, frames_iter=iter(frames)))
    assert [g.shape[0] for g in got] == [4, 4, 2]  # tail batch kept
    assert got[0].shape[1:] == (224, 224, 3)
    want = jax_preprocess_frames(frames)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(g) for g in got]), np.asarray(want),
        rtol=1e-5, atol=1e-5)


def test_decoder_gated_error():
    """Without cv2/ffmpeg the decoder raises the documented error."""
    import pytest as _pytest

    from med_tpu.data.preprocessing import iter_video_frames

    try:
        import cv2  # noqa: F401
        _pytest.skip("cv2 present")
    except ImportError:
        pass
    import shutil
    if shutil.which("ffmpeg"):
        _pytest.skip("ffmpeg present")
    with _pytest.raises(RuntimeError, match="no video decoder"):
        list(iter_video_frames("/nonexistent.avi", 5))


def test_video_decode_roundtrip(tmp_path):
    """Real decode path: write an MJPG video, stream it back at 5 Hz, check
    the count%step==1 frame selection (reference convert_videos_to_frames)."""
    cv2 = pytest.importorskip("cv2")

    from med_tpu.data.preprocessing import decode_video_frames

    path = str(tmp_path / "trial_capture2.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (160, 120))
    for i in range(60):
        w.write(np.full((120, 160, 3), i * 4, np.uint8))
    w.release()

    fr = decode_video_frames(path, 5)
    assert fr.shape == (10, 120, 160, 3)
    # kept 1-based frames 1,7,13,… -> source values 0,24,48,… (MJPG-lossy)
    means = fr.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(means, np.arange(0, 60, 6) * 4, atol=4)
    assert decode_video_frames(path, 30).shape[0] == 60
