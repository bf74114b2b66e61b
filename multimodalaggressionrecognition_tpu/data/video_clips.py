"""Clip-directory video dataset (mp4 + per-frame person bboxes).

Rebuilds the reference's `VideoBboxesDataset` / `VideoDataset` /
`NumpyVideoBboxesDataset2Classes` (reference datasets.py:353-441): each clip
lives in its own directory `<...>!person,X!(t0,t1)!LABEL/` holding
`video.mp4` (or `video.pt`) and `bboxes.npy`; the 4-class Russian labels
{'Нет','Захваты','Толчки','Удары'} map to ids, with a 2-class collapse
variant (datasets.py:354, 372).  Decode is cv2 on host threads; frames are
zero-padded to `frame_num` and the bbox mask rasterized alongside.
"""

import os
from typing import Optional, Sequence

import numpy as np

from .augment import PairedVideoAugment, rasterize_boxes_np
from ..ops.padding import pad_or_truncate

LABELS_4CLASS = {"Нет": 0, "Захваты": 1, "Толчки": 2, "Удары": 3}
LABELS_2CLASS = {"Нет": 0, "Захваты": 1, "Толчки": 1, "Удары": 1}


def read_video_cv2(path: str, start: Optional[int] = None,
                   end: Optional[int] = None):
    """Decode an .mp4 to (T, H, W, 3) RGB float32 in [0, 1] (host).

    Equivalent of the reference's `read_video_frames_opencv`
    (prepare_numpy_data.py:15-35), with BGR->RGB conversion.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if start is not None and idx < start:
            idx += 1
            continue
        if end is not None and idx >= end:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        idx += 1
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames).astype(np.float32) / 255.0


def read_video(path: str, start: Optional[int] = None,
               end: Optional[int] = None):
    """(T, H, W, 3) RGB float32 in [0, 1]: native FFmpeg decode
    (native/marvideo.cpp) when libmarvideo.so is built, else cv2.

    Both routes demux/decode through FFmpeg, so frames agree up to
    swscale colorspace rounding (covered by tests/test_native_video.py).
    """
    from . import native

    if not native.video_available():
        return read_video_cv2(path, start, end)
    v = native.video_read(path, max_frames=end or 0)
    if start:
        v = v[start:]
    if v.shape[0] == 0:
        raise IOError(f"no frames decoded from {path}")
    return v.astype(np.float32) / 255.0


class ClipDirSource:
    """Clip dirs -> batches of {video, mask} + labels.

    `label_of(name)` parses the directory name; default takes the last
    `!`-separated token through the 4-class dict.
    """

    def __init__(self, root: str, frame_num: int = 32, size: int = 112,
                 label_dict=None, augment: Optional[PairedVideoAugment] = None,
                 with_boxes: bool = True, clip_dirs: Optional[Sequence[str]] = None,
                 head: str = "main"):
        self.root = root
        self.frame_num = frame_num
        self.size = size
        self.label_dict = dict(label_dict or LABELS_4CLASS)
        self.augment = augment
        self.with_boxes = with_boxes
        self.head = head
        if clip_dirs is None:
            clip_dirs = sorted(
                d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d)))
        self.clip_dirs = list(clip_dirs)

    def __len__(self):
        return len(self.clip_dirs)

    def _label(self, name: str) -> int:
        return self.label_dict[name.split("!")[-1]]

    def labels(self):
        return np.asarray([self._label(d) for d in self.clip_dirs])

    def load(self, idx: int):
        name = self.clip_dirs[idx]
        clip = os.path.join(self.root, name)
        mp4 = os.path.join(clip, "video.mp4")
        pt = os.path.join(clip, "video.pt")
        if os.path.exists(mp4):
            video = read_video(mp4)
        else:
            import torch

            v = torch.load(pt, map_location="cpu", weights_only=False)
            video = np.asarray(v, np.float32)
            if video.ndim == 4 and video.shape[1] in (1, 3):
                video = video.transpose(0, 2, 3, 1)
            if video.max() > 2.0:
                video = video / 255.0
        boxes = None
        if self.with_boxes:
            boxes = np.load(os.path.join(clip, "bboxes.npy")).astype(np.float32)
            boxes = boxes[:video.shape[0]]
        if self.augment is not None:
            video, boxes = self.augment(video, boxes)
        # resize to (size, size) on host (cv2), keep boxes consistent
        h, w = video.shape[1:3]
        if (h, w) != (self.size, self.size):
            import cv2

            video = np.stack([cv2.resize(f, (self.size, self.size))
                              for f in video])
            if boxes is not None:
                sx, sy = self.size / w, self.size / h
                boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
        mask = None
        if boxes is not None:
            mask = rasterize_boxes_np(boxes, self.size, self.size)[..., None]
            mask = pad_or_truncate(mask, self.frame_num, axis=0)
        video = pad_or_truncate(video, self.frame_num, axis=0)
        return video, mask, self._label(name)

    def build_batch(self, indices, pad_to: Optional[int] = None):
        samples = [self.load(i) for i in indices]
        n = len(samples)
        total = pad_to or n
        smask = np.zeros((total,), np.float32)
        smask[:n] = 1.0
        while len(samples) < total:
            samples.append(samples[0])
        batch = {"modalities": {"video": {
            "data": np.stack([s[0] for s in samples]),
            "present": smask.copy()}}}
        if samples[0][1] is not None:
            batch["modalities"]["video"]["mask"] = np.stack(
                [s[1] for s in samples])
        batch["labels"] = {self.head: np.asarray([s[2] for s in samples], np.int32)}
        batch["label_mask"] = {self.head: smask.copy()}
        batch["sample_mask"] = smask
        return batch
