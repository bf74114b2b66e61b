"""Video preprocessing as MXU-friendly matmuls.

Replaces the reference's torchvision/OpenCV video ops (reference
train_multimodal.py:180-219, datasets.py:85-133) with separable-matmul
equivalents: a bilinear resize (with or without antialias) is
`W_h @ image @ W_w.T` for precomputed interpolation matrices — two matmuls
that XLA maps straight onto the MXU, batched over (B, T, C).

Semantics:
- `resize_matrix(..., antialias=True)` matches torchvision v2.Resize /
  F.interpolate(..., antialias=True) (the reference's default transform);
- `antialias=False` matches nn.functional.interpolate(mode='bilinear'),
  used for the R3DWithBboxes mask pyramid (reference models.py:329);
- `normalize` is the (x - mean) / std channel transform;
- `rasterize_boxes` replaces the cv2.rectangle mask loop
  (reference datasets.py:85-105) with a vectorized comparison.
"""

import functools

import jax.numpy as jnp
import numpy as np


def resize_matrix(in_size: int, out_size: int, antialias: bool = True):
    """(out_size, in_size) row-stochastic bilinear interpolation matrix.

    antialias=True reproduces torch/PIL downscale semantics: the triangle
    filter support scales with the ratio and the window is TRUNCATED at the
    borders then renormalized (no edge replication).  antialias=False
    reproduces torch F.interpolate(mode='bilinear', align_corners=False):
    two taps around (i+0.5)*scale-0.5 with border clamping.
    """
    return jnp.asarray(_resize_matrix_np(in_size, out_size, antialias))


# numpy-only cache: caching the jnp array would store a tracer when first
# called under a jit/eval_shape trace and leak it into later traces
@functools.lru_cache(maxsize=64)
def _resize_matrix_np(in_size: int, out_size: int,
                      antialias: bool = True) -> np.ndarray:
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), np.float64)
    if antialias and scale > 1.0:
        support = scale  # bilinear filter support (1.0) * scale
        for i in range(out_size):
            center = (i + 0.5) * scale
            lo = max(int(center - support + 0.5), 0)
            hi = min(int(center + support + 0.5), in_size)
            j = np.arange(lo, hi, dtype=np.float64)
            w = np.clip(1.0 - np.abs((j + 0.5 - center) / scale), 0.0, None)
            s = w.sum()
            if s > 0:
                mat[i, lo:hi] = w / s
    else:
        for i in range(out_size):
            center = np.clip((i + 0.5) * scale - 0.5, 0.0, in_size - 1)
            lo = int(np.floor(center))
            hi = min(lo + 1, in_size - 1)
            frac = center - lo
            mat[i, lo] += 1.0 - frac
            mat[i, hi] += frac
    return mat.astype(np.float32)


def resize_bilinear(x, out_h: int, out_w: int, antialias: bool = True):
    """Resize (..., H, W, C) images via two matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    wh = resize_matrix(h, out_h, antialias)
    ww = resize_matrix(w, out_w, antialias)
    # contract H: (..., H, W, C) x (out_h, H) -> (..., out_h, W, C)
    y = jnp.einsum("...hwc,oh->...owc", x, wh,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("...hwc,ow->...hoc", y, ww,
                      preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=64)
def _adaptive_avg_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    mat = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat.astype(np.float32)


def adaptive_avg_matrix(in_size: int, out_size: int):
    """(out_size, in_size) matrix reproducing torch AdaptiveAvgPool exactly:
    output[i] = mean(input[floor(i*in/out) : ceil((i+1)*in/out)]).

    Only the numpy build is cached — converting to jnp inside the cache
    would store a tracer when first called under a jit/eval_shape trace,
    leaking it into every later trace (UnexpectedTracerError).
    """
    return jnp.asarray(_adaptive_avg_matrix_np(in_size, out_size))


def adaptive_avg_pool_2d(x, out_h: int, out_w: int):
    """torch AdaptiveAvgPool2d on (..., H, W, C) via two matmuls."""
    wh = adaptive_avg_matrix(x.shape[-3], out_h)
    ww = adaptive_avg_matrix(x.shape[-2], out_w)
    y = jnp.einsum("...hwc,oh->...owc", x, wh,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("...hwc,ow->...hoc", y, ww,
                      preferred_element_type=jnp.float32)


def normalize(x, mean, std):
    """Channel-last normalization: (x - mean) / std."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def rasterize_boxes(boxes, height: int, width: int):
    """XYXY boxes (..., T, 4) -> filled masks (..., T, H, W) in {0, 1}.

    Matches the cv2.rectangle(thickness=-1) fill the reference used:
    inclusive integer corners.
    """
    x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    ys = jnp.arange(height, dtype=boxes.dtype)
    xs = jnp.arange(width, dtype=boxes.dtype)
    row = ((ys[None, :] >= jnp.floor(y1)[..., None])
           & (ys[None, :] <= jnp.ceil(y2)[..., None]))
    col = ((xs[None, :] >= jnp.floor(x1)[..., None])
           & (xs[None, :] <= jnp.ceil(x2)[..., None]))
    return (row[..., :, None] & col[..., None, :]).astype(jnp.float32)


def window_frames(x, window: int):
    """(B, T, H, W, C) -> (B*T//window, window, H, W, C): fold windows into
    the batch so a frozen backbone runs once over all windows (replaces the
    reference's sequential per-window loop, reference models.py:28-32)."""
    b, t = x.shape[:2]
    num = t // window
    return x[:, :num * window].reshape(b * num, window, *x.shape[2:]), num


def unwindow_features(feats, batch: int, num_windows: int):
    """(B*num, D) -> (B, num, D)."""
    return feats.reshape(batch, num_windows, -1)
