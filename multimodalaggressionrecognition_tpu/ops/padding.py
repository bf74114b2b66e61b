"""Fixed-shape length normalization.

Replaces the reference's `AppendZeroValues` / `AppendVideoZeroFrames`
(reference datasets.py:183-231): every variable-length modality is truncated
or zero-padded along its leading time axis to a static target length, which is
what keeps every downstream XLA computation fixed-shape.
"""

import jax.numpy as jnp
import numpy as np


def pad_or_truncate(x, target_len: int, axis: int = 0):
    """Pad with zeros (at the end) or truncate `x` along `axis` to `target_len`.

    Works on both numpy arrays (host pipeline) and jnp arrays (device).
    """
    length = x.shape[axis]
    if length == target_len:
        return x
    xp = jnp if isinstance(x, jnp.ndarray) else np
    if length > target_len:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, target_len)
        return x[tuple(idx)]
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target_len - length)
    return xp.pad(x, pad_widths)
