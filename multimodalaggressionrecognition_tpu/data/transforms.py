"""Host-side fixed-shape transforms for the input pipeline.

The pad-or-truncate length normalizers replace the reference's
`AppendZeroValues`/`AppendVideoZeroFrames` (reference datasets.py:183-231;
targets from train_multimodal.py:180-219: video 128 frames @112px, audio
80 000 samples, text 48x768).  Video resize/normalize runs on device
(ops/video.py) — host transforms only shape and dtype.
"""

from typing import Callable

import numpy as np

from ..ops.padding import pad_or_truncate


def pad_text(target_len: int = 48) -> Callable:
    def fn(x):  # (T, D) -> (target_len, D)
        return pad_or_truncate(np.asarray(x, np.float32), target_len, axis=0)

    return fn


def pad_audio(target_len: int = 80000) -> Callable:
    def fn(x):  # (L,) -> (target_len,)
        return pad_or_truncate(np.asarray(x, np.float32).reshape(-1), target_len)

    return fn


def pad_video(target_frames: int = 128) -> Callable:
    def fn(x):  # (T, H, W, C) -> (target_frames, H, W, C)
        return pad_or_truncate(np.asarray(x, np.float32), target_frames, axis=0)

    return fn


def chain(*fns) -> Callable:
    def fn(x):
        for f in fns:
            x = f(x)
        return x

    return fn
