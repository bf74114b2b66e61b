"""Real .mp4 decode through cv2: write a video, decode it, feed the 3D-CNN
clip pipeline (the reference's prepare_numpy_data/VideoBboxesDataset path)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_mp4(path, frames):
    h, w = frames.shape[1:3]
    for fourcc_name in ("mp4v", "avc1", "MJPG"):
        fourcc = cv2.VideoWriter_fourcc(*fourcc_name)
        ext = ".avi" if fourcc_name == "MJPG" else ".mp4"
        out_path = os.path.splitext(path)[0] + ext
        writer = cv2.VideoWriter(out_path, fourcc, 10.0, (w, h))
        if writer.isOpened():
            for f in frames:
                writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            writer.release()
            if os.path.getsize(out_path) > 0:
                return out_path
    pytest.skip("no working cv2 video codec in this environment")


def test_read_video_cv2_roundtrip(tmp_path, rng):
    from multimodalaggressionrecognition_tpu.data.video_clips import read_video_cv2

    frames = (rng.uniform(0, 255, (8, 48, 64, 3))).astype(np.uint8)
    # large uniform blocks survive lossy encoding recognizably
    frames[:, :24] = 200
    frames[:, 24:] = 40
    path = _write_mp4(str(tmp_path / "video.mp4"), frames)
    decoded = read_video_cv2(path)
    assert decoded.shape == (8, 48, 64, 3)
    assert decoded.dtype == np.float32
    assert 0.0 <= decoded.min() and decoded.max() <= 1.0
    # block structure preserved within lossy-codec tolerance
    assert decoded[:, :20].mean() > 0.6
    assert decoded[:, 28:].mean() < 0.35


def test_clipdir_source_with_mp4(tmp_path, rng):
    from multimodalaggressionrecognition_tpu.data.video_clips import ClipDirSource

    clip = tmp_path / "clip!person,0!(0,1)!Удары"
    clip.mkdir()
    frames = (rng.uniform(0, 255, (8, 48, 64, 3))).astype(np.uint8)
    path = _write_mp4(str(clip / "video.mp4"), frames)
    if not path.endswith("video.mp4"):
        os.rename(path, str(clip / "video.mp4"))
    np.save(str(clip / "bboxes.npy"),
            np.tile(np.asarray([[4, 4, 30, 30]], np.float32), (8, 1)))
    src = ClipDirSource(str(tmp_path), frame_num=8, size=32)
    video, mask, label = src.load(0)
    assert video.shape == (8, 32, 32, 3)
    assert mask.shape == (8, 32, 32, 1)
    assert label == 3  # Удары
    batch = src.build_batch([0], pad_to=2)
    assert batch["modalities"]["video"]["data"].shape == (2, 8, 32, 32, 3)
