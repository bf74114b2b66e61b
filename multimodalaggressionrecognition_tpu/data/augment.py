"""Paired video + bounding-box augmentations (host side, cv2/numpy).

Reimplements the reference's paired transforms (reference datasets.py:22-133,
instantiated at reference train3dcnn.py:70-75) with torchvision-v2-exact
parameter sampling and matrix math: one random parameter draw per *clip*,
applied identically to every frame AND to the per-frame XYXY boxes —
perspective, affine (rotate/translate/scale/shear), horizontal flip, in the
reference's composition order.  Augmentation runs in the host pipeline
threads; the rasterized mask + frames then ship to device together.

torchvision v2 semantics reproduced here (verified by the independent
oracle in tests/test_augment_parity.py):

- ``RandomAffine._get_params``: angle ~ U(-degrees, degrees); translation
  ``int(round(U(-t*size, t*size)))`` per axis; scale ~ U(lo, hi); shear
  ``(U(sx0, sx1), U(sy0, sy1))`` in degrees.
- forward point map ``p' = scale * RSS(angle, shear) @ (p - c) + c + t``
  with ``c = (0.5*w, 0.5*h)`` and torchvision's RSS parameterization
  (``_get_inverse_affine_matrix`` with ``inverted=False``).
- ``RandomPerspective._get_params``: the 4 output corners are displaced
  *inward* by integer ``randint(0, int(d * half) + 1)`` amounts from the
  ``(w-1, h-1)``-convention corners.
- boxes: transform the 4 corners by the forward matrix, re-axis-align
  (min/max), then clamp into the canvas (x in [0, w], y in [0, h]) —
  torchvision clamps after every bbox geometry op.
- horizontal flip on boxes is ``x' = w - x`` (canvas width, no ``-1``):
  box coordinates are continuous edge coordinates, unlike pixel indices.

Frames are warped with cv2 using the same forward matrix; cv2 indexes pixel
centers at integer coordinates while torchvision's continuous convention
puts them at ``i + 0.5``, so the image-space center is shifted by half a
pixel (``c - 0.5``).  Affine uses nearest interpolation (torchvision's
RandomAffine default), perspective uses bilinear (RandomPerspective
default), both with zero fill.
"""

import math
from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None


def _clamp_boxes(boxes, width, height):
    """torchvision clamp_bounding_boxes: XYXY into [0, w] x [0, h]."""
    out = boxes.copy()
    out[:, 0::2] = np.clip(out[:, 0::2], 0, width)
    out[:, 1::2] = np.clip(out[:, 1::2], 0, height)
    return out


def hflip_video_boxes(video, boxes, rng, p: float = 0.5):
    """video (T, H, W, C), boxes (T, 4) XYXY."""
    if rng.random() >= p:
        return video, boxes
    w = video.shape[2]
    video = video[:, :, ::-1].copy()
    if boxes is not None:
        # torchvision horizontal_flip_bounding_boxes: x' = canvas_w - x
        # (continuous edge coordinates; pixel indices would need w-1)
        x1 = w - boxes[:, 2]
        x2 = w - boxes[:, 0]
        flipped = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)
        # the reference transforms only non-empty boxes (datasets.py:74-84:
        # `if bbox.sum()>0`); EMPTY rows stay all-zero
        keep = boxes.sum(axis=1) > 0
        boxes = np.where(keep[:, None], flipped, boxes)
    return video, boxes


def _apply_matrix_to_boxes(boxes, mat, width, height, perspective=False):
    """Transform XYXY boxes by a 2x3 / 3x3 forward matrix; re-axis-align
    (corner min/max) and clamp into the canvas, as torchvision's
    affine/perspective bounding-box kernels do."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = np.stack([
        np.stack([x1, y1], 1), np.stack([x2, y1], 1),
        np.stack([x1, y2], 1), np.stack([x2, y2], 1)], axis=1)  # (T, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), np.float64)
    pts = np.concatenate([corners.astype(np.float64), ones], axis=-1)
    if perspective:
        out = pts @ mat.T  # (T, 4, 3)
        out = out[..., :2] / np.maximum(out[..., 2:3], 1e-8)
    else:
        out = pts @ mat.T  # (T, 4, 2)
    new = np.concatenate([out.min(axis=1), out.max(axis=1)], axis=1)
    new = _clamp_boxes(new, width, height).astype(boxes.dtype)
    # the reference transforms only non-empty boxes (datasets.py:28-40:
    # `if bbox.sum()>0`); EMPTY rows stay all-zero
    keep = boxes.sum(axis=1) > 0
    return np.where(keep[:, None], new, boxes)


def affine_forward_matrix(angle, translate, scale, shear, center):
    """torchvision ``_get_inverse_affine_matrix(..., inverted=False)``:
    the forward 2x3 matrix ``T(c + t) . scale*RSS(angle, shear) . T(-c)``.
    angle/shear in degrees; translate in pixels; center in continuous
    coordinates."""
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    m = [x * scale for x in (a, b, c, d)]
    mat = np.array([[m[0], m[1], 0.0], [m[2], m[3], 0.0]], np.float64)
    mat[0, 2] = mat[0, 0] * (-cx) + mat[0, 1] * (-cy) + cx + tx
    mat[1, 2] = mat[1, 0] * (-cx) + mat[1, 1] * (-cy) + cy + ty
    return mat


def sample_affine_params(rng, degrees, translate, scale, shear, width,
                         height):
    """``v2.RandomAffine._get_params`` re-encode (numpy RNG instead of the
    torch stream; identical distributions)."""
    angle = float(rng.uniform(-degrees, degrees))
    tx = int(round(rng.uniform(-translate[0] * width,
                               translate[0] * width)))
    ty = int(round(rng.uniform(-translate[1] * height,
                               translate[1] * height)))
    s = float(rng.uniform(scale[0], scale[1]))
    shear_x = float(rng.uniform(shear[0], shear[1]))
    shear_y = float(rng.uniform(shear[2], shear[3])) if len(shear) == 4 else 0.0
    return angle, (tx, ty), s, (shear_x, shear_y)


def affine_video_boxes(video, boxes, rng, degrees: float = 4.0,
                       translate: Tuple[float, float] = (0.2, 0.2),
                       scale: Tuple[float, float] = (0.8, 1.2),
                       shear=(-5.0, 5.0, -5.0, 5.0)):
    """One random rotation/translation/scale/shear per clip (defaults =
    the reference's instantiation, train3dcnn.py:72)."""
    if cv2 is None:
        return video, boxes
    t, h, w = video.shape[:3]
    angle, (tx, ty), s, sh = sample_affine_params(
        rng, degrees, translate, scale, shear, w, h)
    # boxes live in continuous coordinates: center = (0.5w, 0.5h)
    mat = affine_forward_matrix(angle, (tx, ty), s, sh, (0.5 * w, 0.5 * h))
    # cv2 indexes pixel centers at integers -> image center shifts by -0.5
    mat_img = affine_forward_matrix(angle, (tx, ty), s, sh,
                                    (0.5 * w - 0.5, 0.5 * h - 0.5))
    out = np.stack([cv2.warpAffine(video[i], mat_img, (w, h),
                                   flags=cv2.INTER_NEAREST)
                    for i in range(t)])
    if out.ndim == 3:  # cv2 drops the channel dim for single-channel frames
        out = out[..., None]
    if boxes is not None:
        boxes = _apply_matrix_to_boxes(boxes, mat, w, h)
    return out, boxes


def sample_perspective_endpoints(rng, distortion, width, height):
    """``v2.RandomPerspective._get_params`` re-encode: displace the four
    ``(w-1, h-1)``-convention corners inward by integer amounts."""
    half_w, half_h = width // 2, height // 2
    bw = int(distortion * half_w) + 1
    bh = int(distortion * half_h) + 1
    topleft = [int(rng.integers(0, bw)), int(rng.integers(0, bh))]
    topright = [width - 1 - int(rng.integers(0, bw)),
                int(rng.integers(0, bh))]
    botright = [width - 1 - int(rng.integers(0, bw)),
                height - 1 - int(rng.integers(0, bh))]
    botleft = [int(rng.integers(0, bw)),
               height - 1 - int(rng.integers(0, bh))]
    startpoints = [[0, 0], [width - 1, 0], [width - 1, height - 1],
                   [0, height - 1]]
    endpoints = [topleft, topright, botright, botleft]
    return startpoints, endpoints


def perspective_video_boxes(video, boxes, rng, distortion: float = 0.2,
                            p: float = 0.5):
    if cv2 is None or rng.random() >= p:
        return video, boxes
    t, h, w = video.shape[:3]
    startpoints, endpoints = sample_perspective_endpoints(rng, distortion,
                                                          w, h)
    mat = cv2.getPerspectiveTransform(np.float32(startpoints),
                                      np.float32(endpoints))
    out = np.stack([cv2.warpPerspective(video[i], mat, (w, h),
                                        flags=cv2.INTER_LINEAR)
                    for i in range(t)])
    if out.ndim == 3:
        out = out[..., None]
    if boxes is not None:
        boxes = _apply_matrix_to_boxes(boxes, mat, w, h, perspective=True)
    return out, boxes


def rasterize_boxes_np(boxes, height: int, width: int):
    """Host mirror of ops.video.rasterize_boxes: (T, 4) -> (T, H, W).

    Fill semantics match the reference's ``cv2.rectangle(..., -1)``
    (reference datasets.py:86-107): both corner pixels inclusive, with
    fractional coordinates expanded outward (floor start / ceil end)."""
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
    """Compose perspective/affine/flip with per-clip RNG — the reference's
    composition order (train3dcnn.py:70-75: ResizeBboxes ->
    RandomPerspective -> RandomAffine -> RandomHorizontalFlip ->
    CreateBboxesMasks); defaults are the reference's instantiation values."""

    def __init__(self, hflip_p: float = 0.5, degrees: float = 4.0,
                 translate=(0.2, 0.2), scale=(0.8, 1.2),
                 shear=(-5.0, 5.0, -5.0, 5.0),
                 perspective_p: float = 0.5, distortion: float = 0.2,
                 seed: int = 0):
        self.hflip_p = hflip_p
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.perspective_p = perspective_p
        self.distortion = distortion
        self.rng = np.random.default_rng(seed)

    def __call__(self, video, boxes):
        video, boxes = perspective_video_boxes(video, boxes, self.rng,
                                               self.distortion,
                                               self.perspective_p)
        video, boxes = affine_video_boxes(video, boxes, self.rng,
                                          self.degrees, self.translate,
                                          self.scale, self.shear)
        video, boxes = hflip_video_boxes(video, boxes, self.rng, self.hflip_p)
        return video, boxes
