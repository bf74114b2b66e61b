"""Golden parity for paired video+bbox augmentations (VERDICT r3 item 2).

data/augment.py re-encodes torchvision v2's transform semantics (the
reference composes v2.RandomPerspective/RandomAffine/RandomHorizontalFlip
over (video, boxes) pairs, reference datasets.py:22-133, instantiated at
train3dcnn.py:70-75).  torchvision itself is not installed here, so the
oracle below re-derives the same math through a structurally different
route and asserts augment.py matches:

- affine matrix: explicit 3x3 composition T(c+t) @ s*(R(a) @ SHy @ SHx)
  @ T(-c) vs the implementation's closed form (torchvision
  _get_inverse_affine_matrix, inverted=False)
- box geometry: per-corner scalar transforms + min/max + clamp vs the
  vectorized kernel, including degenerate and EMPTY (all-zero) boxes
- frame warps: pure-numpy inverse-mapping warps (nearest for affine,
  bilinear for perspective) vs the cv2-backed implementation
- perspective homography: np.linalg.solve of the 8-coefficient system vs
  cv2.getPerspectiveTransform
- mask raster: cv2.rectangle(..., thickness=-1) fill vs rasterize_boxes_np
- parameter sampling: bounds/dtype laws of RandomAffine._get_params /
  RandomPerspective._get_params
"""

import math

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multimodalaggressionrecognition_tpu.data.augment import (
    PairedVideoAugment, _apply_matrix_to_boxes, affine_forward_matrix,
    affine_video_boxes, hflip_video_boxes, perspective_video_boxes,
    rasterize_boxes_np, sample_affine_params,
    sample_perspective_endpoints)


def _oracle_affine_matrix(angle, translate, scale, shear, center):
    """T(c+t) @ s*(R(a) @ SHy(sy) @ SHx(sx)) @ T(-c) from primitive 3x3s."""
    a = math.radians(angle)
    sx, sy = (math.radians(v) for v in shear)

    def T(tx, ty):
        return np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)

    R = np.array([[math.cos(a), -math.sin(a), 0],
                  [math.sin(a), math.cos(a), 0], [0, 0, 1]], np.float64)
    SHy = np.array([[1, 0, 0], [-math.tan(sy), 1, 0], [0, 0, 1]], np.float64)
    SHx = np.array([[1, -math.tan(sx), 0], [0, 1, 0], [0, 0, 1]], np.float64)
    S = np.diag([scale, scale, 1.0])
    cx, cy = center
    tx, ty = translate
    return (T(cx + tx, cy + ty) @ S @ R @ SHy @ SHx @ T(-cx, -cy))[:2]


def test_affine_matrix_matches_primitive_composition():
    rng = np.random.default_rng(0)
    for _ in range(50):
        angle = float(rng.uniform(-180, 180))
        translate = (float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20)))
        scale = float(rng.uniform(0.5, 2.0))
        shear = (float(rng.uniform(-30, 30)), float(rng.uniform(-30, 30)))
        center = (float(rng.uniform(0, 100)), float(rng.uniform(0, 100)))
        got = affine_forward_matrix(angle, translate, scale, shear, center)
        want = _oracle_affine_matrix(angle, translate, scale, shear, center)
        np.testing.assert_allclose(got, want, atol=1e-9)


def _oracle_boxes(boxes, mat, width, height, perspective=False):
    """Scalar per-corner transform + min/max + clamp; zero rows preserved."""
    out = boxes.astype(np.float64).copy()
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        if x1 + y1 + x2 + y2 <= 0:
            continue
        pts = []
        for (x, y) in ((x1, y1), (x2, y1), (x1, y2), (x2, y2)):
            if perspective:
                d = mat[2, 0] * x + mat[2, 1] * y + mat[2, 2]
                d = max(d, 1e-8)
            else:
                d = 1.0
            pts.append(((mat[0, 0] * x + mat[0, 1] * y + mat[0, 2]) / d,
                        (mat[1, 0] * x + mat[1, 1] * y + mat[1, 2]) / d))
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        out[i] = [min(max(min(xs), 0), width), min(max(min(ys), 0), height),
                  min(max(max(xs), 0), width), min(max(max(ys), 0), height)]
    return out.astype(boxes.dtype)


@pytest.mark.parametrize("perspective", [False, True])
def test_box_transform_matches_per_corner_oracle(perspective):
    rng = np.random.default_rng(1)
    w, h = 64, 48
    boxes = np.array([
        [5, 5, 30, 20],
        [0, 0, 64, 48],       # full canvas
        [10, 10, 10, 10],     # degenerate point box
        [0, 0, 0, 0],         # EMPTY: must stay zero (datasets.py:28-40)
        [60, 44, 64, 48],     # at the corner, will clamp
    ], np.float32)
    for _ in range(20):
        if perspective:
            src = np.float32([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
            dst = src + rng.uniform(-6, 6, (4, 2)).astype(np.float32)
            mat = cv2.getPerspectiveTransform(src, dst).astype(np.float64)
        else:
            mat = affine_forward_matrix(
                float(rng.uniform(-30, 30)),
                (float(rng.uniform(-8, 8)), float(rng.uniform(-8, 8))),
                float(rng.uniform(0.7, 1.4)),
                (float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10))),
                (w / 2, h / 2))
        got = _apply_matrix_to_boxes(boxes, mat, w, h,
                                     perspective=perspective)
        want = _oracle_boxes(boxes, np.vstack([mat, [0, 0, 1]])[:3]
                             if not perspective else mat, w, h, perspective)
        np.testing.assert_allclose(got, want, atol=1e-3)
        assert (got[3] == 0).all()


def test_hflip_box_semantics():
    """torchvision: x' = canvas_w - x (no -1); zero boxes preserved."""
    video = np.arange(2 * 4 * 6 * 1, dtype=np.float32).reshape(2, 4, 6, 1)
    boxes = np.array([[1, 0, 3, 2], [0, 0, 0, 0]], np.float32)

    class AlwaysFlip:
        def random(self):
            return 0.0

    out_v, out_b = hflip_video_boxes(video, boxes, AlwaysFlip(), p=0.5)
    np.testing.assert_array_equal(out_v, video[:, :, ::-1])
    np.testing.assert_array_equal(out_b[0], [6 - 3, 0, 6 - 1, 2])
    assert (out_b[1] == 0).all()
    # flip twice = identity (only true for the w - x convention)
    _, out_b2 = hflip_video_boxes(out_v, out_b, AlwaysFlip(), p=0.5)
    np.testing.assert_array_equal(out_b2, boxes)


def _numpy_inverse_warp(frame, mat, perspective=False, nearest=True):
    """dst(x,y) = src(M^-1 (x,y)): the textbook inverse-mapping warp."""
    h, w = frame.shape[:2]
    m = np.vstack([mat, [0, 0, 1]]) if mat.shape[0] == 2 else mat
    inv = np.linalg.inv(m)
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], 0)
    src = inv @ pts
    if perspective:
        src = src[:2] / src[2:3]
    else:
        src = src[:2]
    out = np.zeros_like(frame)
    if nearest:
        sx = np.round(src[0]).astype(int)
        sy = np.round(src[1]).astype(int)
        ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        out.reshape(h * w, -1)[ok] = frame[sy[ok], sx[ok]].reshape(-1, frame.shape[-1])
    else:
        x0 = np.floor(src[0]).astype(int)
        y0 = np.floor(src[1]).astype(int)
        fx = src[0] - x0
        fy = src[1] - y0
        acc = np.zeros((h * w, frame.shape[-1]), np.float64)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = np.clip(x0 + dx, 0, w - 1)
                yi = np.clip(y0 + dy, 0, h - 1)
                inside = ((x0 + dx >= 0) & (x0 + dx < w)
                          & (y0 + dy >= 0) & (y0 + dy < h))
                acc += (wx * wy * inside)[:, None] * frame[yi, xi]
        out = acc.reshape(frame.shape).astype(frame.dtype)
    return out


def test_affine_frame_warp_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    h, w = 40, 56
    video = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    boxes = np.array([[4, 4, 20, 16], [4, 4, 20, 16]], np.float32)

    class FixedRng:
        """Deterministic, tie-free params."""
        _vals = iter([0.31, -0.27, 0.18, 0.93, 0.41, -0.22])

        def uniform(self, lo, hi):
            v = next(self._vals)
            return lo + (hi - lo) * (v * 0.5 + 0.5)

    out, out_boxes = affine_video_boxes(video, boxes, FixedRng(),
                                        degrees=17.0, translate=(0.1, 0.1),
                                        scale=(0.8, 1.2),
                                        shear=(-8.0, 8.0, -8.0, 8.0))
    # rebuild the image-space matrix exactly as the implementation defines
    # it (continuous center - 0.5), then warp with the numpy oracle
    params_rng = FixedRng()
    params_rng._vals = iter([0.31, -0.27, 0.18, 0.93, 0.41, -0.22])
    angle, (tx, ty), s, sh = sample_affine_params(
        params_rng, 17.0, (0.1, 0.1), (0.8, 1.2), (-8.0, 8.0, -8.0, 8.0),
        w, h)
    mat_img = affine_forward_matrix(angle, (tx, ty), s, sh,
                                    (0.5 * w - 0.5, 0.5 * h - 0.5))
    for i in range(2):
        want = _numpy_inverse_warp(video[i], mat_img, nearest=True)
        # cv2 nearest uses fixed-point source coords; a handful of pixels on
        # rounding boundaries may pick the other neighbor
        mismatch = np.mean(np.any(out[i] != want, axis=-1))
        assert mismatch < 0.02, f"frame {i}: {mismatch:.3f} pixels differ"


def test_perspective_frame_and_homography_match_oracles():
    h, w = 36, 44
    video = np.random.default_rng(30).uniform(
        0, 1, (1, h, w, 3)).astype(np.float32)

    rng = np.random.default_rng(3)
    startpoints, endpoints = sample_perspective_endpoints(rng, 0.2, w, h)
    # homography oracle: solve the 8-coefficient linear system directly
    A, b = [], []
    for (sx, sy), (ex, ey) in zip(startpoints, endpoints):
        A.append([sx, sy, 1, 0, 0, 0, -ex * sx, -ex * sy])
        A.append([0, 0, 0, sx, sy, 1, -ey * sx, -ey * sy])
        b += [ex, ey]
    coef = np.linalg.solve(np.array(A, np.float64), np.array(b, np.float64))
    mat_oracle = np.append(coef, 1.0).reshape(3, 3)
    mat_cv = cv2.getPerspectiveTransform(np.float32(startpoints),
                                         np.float32(endpoints))
    np.testing.assert_allclose(mat_cv, mat_oracle, atol=1e-8)

    class NoSkip:
        def __init__(self, inner):
            self.inner = inner

        def random(self):
            return 0.0  # always apply

        def integers(self, lo, hi):
            return self.inner.integers(lo, hi)

    rng2 = np.random.default_rng(3)
    out, _ = perspective_video_boxes(video, None, NoSkip(rng2),
                                     distortion=0.2, p=0.5)
    want = _numpy_inverse_warp(video[0], mat_oracle, perspective=True,
                               nearest=False)
    # cv2 bilinear uses 5-bit fixed-point interpolation weights
    assert np.max(np.abs(out[0] - want)) < 0.05


def test_perspective_sampling_matches_torchvision_bounds():
    """RandomPerspective._get_params displaces the (w-1, h-1) corners
    inward by integer randint(0, int(d*half)+1) amounts."""
    w, h = 64, 48
    d = 0.2
    bw, bh = int(d * (w // 2)) + 1, int(d * (h // 2)) + 1
    rng = np.random.default_rng(4)
    for _ in range(200):
        start, end = sample_perspective_endpoints(rng, d, w, h)
        assert start == [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]]
        (tl, tr, br, bl) = end
        assert 0 <= tl[0] < bw and 0 <= tl[1] < bh
        assert w - bw <= tr[0] <= w - 1 and 0 <= tr[1] < bh
        assert w - bw <= br[0] <= w - 1 and h - bh <= br[1] <= h - 1
        assert 0 <= bl[0] < bw and h - bh <= bl[1] <= h - 1
        assert all(isinstance(v, int) for pt in end for v in pt)


def test_affine_sampling_matches_torchvision_bounds():
    """RandomAffine._get_params: integer translations, bounded params."""
    rng = np.random.default_rng(5)
    w, h = 100, 60
    for _ in range(200):
        angle, (tx, ty), s, (sx, sy) = sample_affine_params(
            rng, 4.0, (0.2, 0.2), (0.8, 1.2), (-5.0, 5.0, -5.0, 5.0), w, h)
        assert -4.0 <= angle <= 4.0
        assert isinstance(tx, int) and abs(tx) <= round(0.2 * w)
        assert isinstance(ty, int) and abs(ty) <= round(0.2 * h)
        assert 0.8 <= s <= 1.2
        assert -5.0 <= sx <= 5.0 and -5.0 <= sy <= 5.0


def test_rasterize_matches_cv2_rectangle():
    """CreateBboxesMasks parity: cv2.rectangle(..., -1) fills BOTH corner
    pixels inclusive (reference datasets.py:86-107)."""
    h, w = 24, 32
    rng = np.random.default_rng(6)
    for _ in range(25):
        x1, y1 = int(rng.integers(0, w - 1)), int(rng.integers(0, h - 1))
        x2 = int(rng.integers(x1, w))
        y2 = int(rng.integers(y1, h))
        boxes = np.array([[x1, y1, x2, y2]], np.float32)
        got = rasterize_boxes_np(boxes, h, w)[0]
        canvas = np.zeros((h, w), np.uint8)
        cv2.rectangle(canvas, (x1, y1), (x2, y2), (255,), -1)
        np.testing.assert_array_equal(got, (canvas > 0).astype(np.float32))
    # fractional boxes expand outward (floor start / ceil end)
    got = rasterize_boxes_np(np.array([[1.2, 2.7, 3.1, 4.0]], np.float32),
                             h, w)[0]
    canvas = np.zeros((h, w), np.uint8)
    cv2.rectangle(canvas, (1, 2), (4, 4), (255,), -1)
    np.testing.assert_array_equal(got, (canvas > 0).astype(np.float32))


def test_paired_augment_end_to_end_keeps_pairing():
    """Composition order (perspective->affine->flip) and pairing: warped
    frames and boxes stay consistent — a bright patch painted inside the
    source box must stay (mostly) inside the transformed box."""
    h = w = 48
    rng = np.random.default_rng(7)
    for seed in range(8):
        video = np.zeros((3, h, w, 3), np.float32)
        x1, y1, x2, y2 = 12, 14, 30, 34
        video[:, y1:y2, x1:x2] = 1.0
        boxes = np.tile(np.array([[x1, y1, x2, y2]], np.float32), (3, 1))
        aug = PairedVideoAugment(seed=seed)
        out_v, out_b = aug(video, boxes)
        assert out_v.shape == video.shape and out_b.shape == boxes.shape
        for i in range(3):
            bx1, by1, bx2, by2 = out_b[i]
            assert 0 <= bx1 <= bx2 <= w and 0 <= by1 <= by2 <= h
            inside = out_v[i, int(np.floor(by1)):int(np.ceil(by2)),
                           int(np.floor(bx1)):int(np.ceil(bx2))].sum()
            total = out_v[i].sum()
            if total > 0:
                # bilinear smearing can leak a little outside the AABB
                assert inside / total > 0.95, (seed, i, inside / total)
