"""Paired video + bounding-box augmentations (host side, cv2/numpy).

Reimplements the reference's paired transforms (reference datasets.py:22-133):
one random parameter draw per *clip*, applied identically to every frame AND
to the per-frame XYXY boxes — horizontal flip, affine (rotate/translate/
scale), perspective.  Augmentation runs in the host pipeline threads; the
rasterized mask + frames then ship to device together.
"""

from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None


def hflip_video_boxes(video, boxes, rng, p: float = 0.5):
    """video (T, H, W, C), boxes (T, 4) XYXY."""
    if rng.random() >= p:
        return video, boxes
    w = video.shape[2]
    video = video[:, :, ::-1].copy()
    if boxes is not None:
        x1 = w - 1 - boxes[:, 2]
        x2 = w - 1 - boxes[:, 0]
        boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)
    return video, boxes


def _apply_matrix_to_boxes(boxes, mat, perspective=False):
    """Transform XYXY boxes by a 2x3 / 3x3 matrix; re-axis-align."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = np.stack([
        np.stack([x1, y1], 1), np.stack([x2, y1], 1),
        np.stack([x1, y2], 1), np.stack([x2, y2], 1)], axis=1)  # (T, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), corners.dtype)
    pts = np.concatenate([corners, ones], axis=-1)  # (T, 4, 3)
    if perspective:
        out = pts @ mat.T  # (T, 4, 3)
        out = out[..., :2] / np.maximum(out[..., 2:3], 1e-8)
    else:
        out = pts @ mat.T  # (T, 4, 2)
    new = np.concatenate([out.min(axis=1), out.max(axis=1)], axis=1)
    return new.astype(boxes.dtype)


def affine_video_boxes(video, boxes, rng, degrees: float = 10.0,
                       translate: Tuple[float, float] = (0.1, 0.1),
                       scale: Tuple[float, float] = (0.9, 1.1)):
    """One random rotation/translation/scale per clip."""
    if cv2 is None:
        return video, boxes
    t, h, w = video.shape[:3]
    angle = rng.uniform(-degrees, degrees)
    tx = rng.uniform(-translate[0], translate[0]) * w
    ty = rng.uniform(-translate[1], translate[1]) * h
    s = rng.uniform(*scale)
    mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, s)
    mat[0, 2] += tx
    mat[1, 2] += ty
    out = np.stack([cv2.warpAffine(video[i], mat, (w, h)) for i in range(t)])
    if out.ndim == 3:  # cv2 drops the channel dim for single-channel frames
        out = out[..., None]
    if boxes is not None:
        boxes = _apply_matrix_to_boxes(boxes, mat)
    return out, boxes


def perspective_video_boxes(video, boxes, rng, distortion: float = 0.3,
                            p: float = 0.5):
    if cv2 is None or rng.random() >= p:
        return video, boxes
    t, h, w = video.shape[:3]
    d = distortion
    src = np.float32([[0, 0], [w, 0], [0, h], [w, h]])
    jitter = rng.uniform(0, d, (4, 2)).astype(np.float32) * np.float32(
        [[w, h]]) * np.float32([[1, 1], [-1, 1], [1, -1], [-1, -1]])
    dst = src + jitter
    mat = cv2.getPerspectiveTransform(src, dst)
    out = np.stack([cv2.warpPerspective(video[i], mat, (w, h)) for i in range(t)])
    if out.ndim == 3:
        out = out[..., None]
    if boxes is not None:
        boxes = _apply_matrix_to_boxes(boxes, mat, perspective=True)
    return out, boxes


def rasterize_boxes_np(boxes, height: int, width: int):
    """Host mirror of ops.video.rasterize_boxes: (T, 4) -> (T, H, W)."""
    t = boxes.shape[0]
    mask = np.zeros((t, height, width), np.float32)
    ys = np.arange(height)
    xs = np.arange(width)
    for i in range(t):
        x1, y1, x2, y2 = boxes[i]
        row = (ys >= np.floor(y1)) & (ys <= np.ceil(y2))
        col = (xs >= np.floor(x1)) & (xs <= np.ceil(x2))
        mask[i] = row[:, None] & col[None, :]
    return mask


class PairedVideoAugment:
    """Compose flip/affine/perspective with per-clip RNG, then rasterize."""

    def __init__(self, hflip_p: float = 0.5, degrees: float = 10.0,
                 translate=(0.1, 0.1), scale=(0.9, 1.1),
                 perspective_p: float = 0.5, distortion: float = 0.3,
                 seed: int = 0):
        self.hflip_p = hflip_p
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.perspective_p = perspective_p
        self.distortion = distortion
        self.rng = np.random.default_rng(seed)

    def __call__(self, video, boxes):
        video, boxes = hflip_video_boxes(video, boxes, self.rng, self.hflip_p)
        video, boxes = affine_video_boxes(video, boxes, self.rng, self.degrees,
                                          self.translate, self.scale)
        video, boxes = perspective_video_boxes(video, boxes, self.rng,
                                               self.distortion,
                                               self.perspective_p)
        return video, boxes
