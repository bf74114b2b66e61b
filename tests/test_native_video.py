"""Native video decode library (libmarvideo.so): parity with the cv2 path.

Both routes decode through FFmpeg codecs; frames must agree up to swscale
colorspace rounding.  The library needs the libav* dev packages at build
time — tests skip when `make -C native` can't produce it.
"""

import os
import subprocess

import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.data import native

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not native.video_available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=False)
        native._VTRIED = False
    if not native.video_available():
        pytest.skip("libmarvideo.so unavailable (FFmpeg dev libs missing)")


def _write_mp4(path, frames, fps=10.0):
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        pytest.skip("no working cv2 mp4 codec in this environment")
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    if os.path.getsize(path) == 0:
        pytest.skip("cv2 produced an empty mp4")
    return path


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 255, (12, 48, 64, 3)).astype(np.uint8)
    frames[:, :24] = 200  # blocks survive lossy encoding recognizably
    frames[:, 24:] = 40
    path = str(tmp_path_factory.mktemp("vid") / "video.mp4")
    return _write_mp4(path, frames), frames


def test_probe(clip):
    path, frames = clip
    w, h, n, fps = native.video_probe(path)
    assert (w, h) == (64, 48)
    assert n in (0, len(frames))
    if fps:
        assert abs(fps - 10.0) < 0.5


def test_read_matches_cv2(clip):
    from multimodalaggressionrecognition_tpu.data.video_clips import (
        read_video_cv2)

    path, frames = clip
    got = native.video_read(path)
    ref = (read_video_cv2(path) * 255.0).round().astype(np.int32)
    assert got.shape == ref.shape == (12, 48, 64, 3)
    # same FFmpeg decode; only the YUV->RGB conversion differs in rounding
    diff = np.abs(got.astype(np.int32) - ref)
    assert np.percentile(diff, 99) <= 2
    assert diff.mean() < 1.0


def test_read_max_frames_and_resize(clip):
    path, _ = clip
    got = native.video_read(path, max_frames=5, size=32)
    assert got.shape == (5, 32, 32, 3)
    full = native.video_read(path, size=32)
    np.testing.assert_array_equal(got, full[:5])
    # resized frames keep the block structure (top bright, bottom dark)
    assert got[:, :12].mean() > 150
    assert got[:, 20:].mean() < 90


def test_batch_zero_pads(clip, tmp_path):
    path, frames = clip
    short = str(tmp_path / "short.mp4")
    _write_mp4(short, frames[:4])
    out = native.video_batch([path, short], frames=8, size=48, num_threads=2)
    assert out.shape == (2, 8, 48, 48, 3)
    assert out[0].any(axis=(1, 2, 3)).all()   # 12-frame clip fills all 8
    assert out[1, :4].any(axis=(1, 2, 3)).all()
    assert not out[1, 4:].any()               # 4-frame clip zero-padded
    solo = native.video_read(short, max_frames=8, size=48)
    np.testing.assert_array_equal(out[1, :4], solo[:4])


def test_batch_reports_failures(tmp_path):
    with pytest.raises(IOError):
        native.video_batch([str(tmp_path / "missing.mp4")], frames=4, size=32)


def test_read_video_prefers_native(clip, monkeypatch):
    from multimodalaggressionrecognition_tpu.data import video_clips

    path, _ = clip
    v = video_clips.read_video(path)
    assert v.dtype == np.float32 and v.shape == (12, 48, 64, 3)
    assert 0.0 <= v.min() and v.max() <= 1.0

    def boom(*a, **k):  # fallback must not be hit while native is available
        raise AssertionError("cv2 fallback used despite native decoder")

    monkeypatch.setattr(video_clips, "read_video_cv2", boom)
    v2 = video_clips.read_video(path, end=6)
    assert v2.shape == (6, 48, 64, 3)
    np.testing.assert_array_equal(v2, v[:6])
