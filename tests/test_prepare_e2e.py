"""End-to-end offline data prep: mp4 -> decode-videos/resize-videos/split ->
dataset sources (reference prepare_numpy_data.py, make_pt_video.py:13-21,
split_dataset.py:34-79), plus bbox/resize consistency vs torchvision v2
semantics computed manually (reference datasets.py:107-133)."""

import os

import numpy as np
import pytest
import torch

cv2 = pytest.importorskip("cv2")

from test_mp4_decode import _write_mp4
from multimodalaggressionrecognition_tpu.cli import prepare_data
from multimodalaggressionrecognition_tpu.data.augment import rasterize_boxes_np
from multimodalaggressionrecognition_tpu.data.video_clips import (
    ClipDirSource, read_video_cv2)


def _block_frames(rng, t=8, h=48, w=64):
    frames = rng.uniform(0, 255, (t, h, w, 3)).astype(np.uint8)
    frames[:, : h // 2] = 200
    frames[:, h // 2:] = 40
    return frames


def test_decode_resize_split_pipeline(tmp_path, rng):
    raw = tmp_path / "raw"
    raw.mkdir()
    frames = _block_frames(rng)
    for name in ("c-1_vidA_._0-1_._AGGR", "c-2_vidB_._0-1_._NOAGGR"):
        p = _write_mp4(str(raw / f"{name}.mp4"), frames)
        if not p.endswith(".mp4"):
            os.rename(p, str(raw / f"{name}.mp4"))

    # decode-videos: mp4 -> uint8 THWC .npy with frame cut (ref frame_cut=304)
    npys = tmp_path / "npys"
    prepare_data.main(["decode-videos", str(raw), str(npys), "--frame_cut", "6"])
    arr = np.load(npys / "c-1_vidA_._0-1_._AGGR.npy")
    assert arr.shape == (6, 48, 64, 3) and arr.dtype == np.uint8
    assert arr[:, :20].mean() > 150 and arr[:, 28:].mean() < 90

    # resize-videos: mp4 -> resized float TCHW .pt (ref make_pt_video.py)
    pts = tmp_path / "pts"
    prepare_data.main(["resize-videos", str(raw), str(pts), "--size", "32"])
    vid = torch.load(pts / "c-1_vidA_._0-1_._AGGR.pt", weights_only=False)
    assert tuple(vid.shape) == (8, 3, 32, 32)
    v = vid.numpy()
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert v[:, :, :12].mean() > 0.6 and v[:, :, 20:].mean() < 0.35

    # resize-videos also accepts decoded .npy inputs
    pts2 = tmp_path / "pts2"
    prepare_data.main(["resize-videos", str(npys), str(pts2), "--size", "16"])
    vid2 = torch.load(pts2 / "c-1_vidA_._0-1_._AGGR.pt", weights_only=False)
    assert tuple(vid2.shape) == (6, 3, 16, 16)

    # the resized .pt feeds the clip dataset (video.pt branch of load())
    clip = tmp_path / "ds" / "clip!person,0!(0,1)!Нет"
    clip.mkdir(parents=True)
    torch.save(vid, clip / "video.pt")
    src = ClipDirSource(str(tmp_path / "ds"), frame_num=8, size=32,
                        with_boxes=False)
    video, mask, label = src.load(0)
    assert video.shape == (8, 32, 32, 3) and label == 0
    np.testing.assert_allclose(video, v.transpose(0, 2, 3, 1), atol=1e-6)

    # split: cluster-keyed copy into train/ + test/ trees
    root = tmp_path / "dataset"
    (root / "physical" / "video").mkdir(parents=True)
    for f in os.listdir(npys):
        os.link(npys / f, root / "physical" / "video" / f)
    split_json = tmp_path / "split.json"
    split_json.write_text('{"train": [1], "test": [2]}')
    prepare_data.main(["split", str(root), str(split_json)])
    assert os.path.exists(
        root / "train" / "physical" / "video" / "c-1_vidA_._0-1_._AGGR.npy")
    assert os.path.exists(
        root / "test" / "physical" / "video" / "c-2_vidB_._0-1_._NOAGGR.npy")
    assert not os.path.exists(
        root / "train" / "physical" / "video" / "c-2_vidB_._0-1_._NOAGGR.npy")


def test_clipdir_resize_scales_boxes_like_torchvision_v2(tmp_path, rng):
    """ClipDirSource resizes video with cv2 and scales XYXY boxes by
    (new/old) per axis — the same transform torchvision v2.Resize applies
    to tv_tensors.BoundingBoxes (reference datasets.py:114-133), computed
    here manually as the independent oracle."""
    t, h, w, size = 6, 40, 60, 30
    clip = tmp_path / "clip!person,1!(0,2)!Толчки"
    clip.mkdir()
    video = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)
    torch.save(torch.from_numpy(video.transpose(0, 3, 1, 2)), clip / "video.pt")
    boxes = np.tile(np.asarray([[6.0, 8.0, 42.0, 28.0]], np.float32), (t, 1))
    np.save(clip / "bboxes.npy", boxes)

    src = ClipDirSource(str(tmp_path), frame_num=t, size=size)
    out_video, out_mask, label = src.load(0)
    assert label == 2  # Толчки

    # torchvision v2.Resize box semantics: x *= new_w/w, y *= new_h/h
    sx, sy = size / w, size / h
    expected_boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
    expected_mask = rasterize_boxes_np(expected_boxes, size, size)[..., None]
    np.testing.assert_array_equal(out_mask, expected_mask)
    assert out_mask.sum() > 0
