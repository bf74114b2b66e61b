"""ctypes bindings for the native host libraries (native/marhost.cpp,
native/marvideo.cpp).

Provides C++-speed WAV decode + polyphase resample + threaded batch assembly
(libmarhost.so, dependency-free) and FFmpeg mp4 decode + fused resize +
threaded batch assembly (libmarvideo.so, needs the libav* dev libraries at
build time) for the input pipeline; falls back to the scipy/numpy and cv2
paths when a shared library hasn't been built.  Build with `make -C native`.
"""

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_VLIB: Optional[ctypes.CDLL] = None
_VTRIED = False


def _lib_path(name: str = "libmarhost.so"):
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native", name)


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.mar_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.POINTER(ctypes.c_long)]
    lib.mar_wav_read.restype = ctypes.c_int
    lib.mar_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int]
    lib.mar_wav_batch.restype = ctypes.c_int
    lib.mar_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long)]
    lib.mar_resample.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def wav_read(path: str, target_len: int, target_rate: int = 16000) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("libmarhost.so not built (make -C native)")
    out = np.zeros(target_len, np.float32)
    decoded = ctypes.c_long(0)
    rc = lib.mar_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len, target_rate, ctypes.byref(decoded))
    if rc != 0:
        raise IOError(f"mar_wav_read failed for {path}")
    return out


def wav_batch(paths: Sequence[str], target_len: int, target_rate: int = 16000,
              num_threads: int = 4) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("libmarhost.so not built (make -C native)")
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.mar_wav_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len, target_rate, num_threads)
    if failures:
        raise IOError(f"{failures} wav files failed to decode")
    return out


def load_video_library() -> Optional[ctypes.CDLL]:
    global _VLIB, _VTRIED
    if _VTRIED:
        return _VLIB
    _VTRIED = True
    path = _lib_path("libmarvideo.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:  # built elsewhere; libav* runtime libs absent here
        return None
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.mar_video_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double)]
    lib.mar_video_probe.restype = ctypes.c_int
    lib.mar_video_read.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.mar_video_read.restype = ctypes.c_long
    lib.mar_video_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mar_video_batch.restype = ctypes.c_int
    _VLIB = lib
    return lib


def video_available() -> bool:
    return load_video_library() is not None


def video_probe(path: str):
    """(width, height, nb_frames, fps); nb_frames is 0 when the container
    doesn't record a count (decode to find out)."""
    lib = load_video_library()
    if lib is None:
        raise RuntimeError("libmarvideo.so not built (make -C native)")
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    n, fps = ctypes.c_long(0), ctypes.c_double(0)
    if lib.mar_video_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(n), ctypes.byref(fps)):
        raise IOError(f"mar_video_probe failed for {path}")
    return w.value, h.value, n.value, fps.value


# decode-buffer guards: the batch pipeline passes explicit frames/size, so
# these only bound the read-everything path on pathological inputs (a
# fragmented container with no nb_frames, or a corrupt frame count)
_MAX_DECODE_BYTES = 8 << 30
_FIRST_GUESS_BYTES = 1 << 30


def video_read(path: str, max_frames: int = 0,
               size: Optional[int] = None) -> np.ndarray:
    """Decode to (T, H, W, 3) RGB uint8; `size` resizes (bilinear, fused
    into the decode's swscale pass), `max_frames` caps T (0 = all).

    When the container carries no frame count, the whole-file read decodes
    into a geometrically grown buffer (each growth re-decodes — the C API
    is stateless); reads that would exceed an 8 GB buffer raise instead of
    silently truncating — pass max_frames= or size= for such files."""
    lib = load_video_library()
    if lib is None:
        raise RuntimeError("libmarvideo.so not built (make -C native)")
    w, h, n, fps = video_probe(path)
    if size is not None:
        w = h = size
    frame_bytes = max(h * w * 3, 1)
    if max_frames:
        cap = max_frames
    elif n > 0:
        cap = n
    else:  # unknown count: start from a ~1 GB guess, grow on overflow
        cap = max(_FIRST_GUESS_BYTES // frame_bytes, 16)
    while True:
        if cap * frame_bytes > _MAX_DECODE_BYTES:
            raise IOError(
                f"{path}: decoding {cap} frames at {w}x{h} needs "
                f"{cap * frame_bytes >> 30} GB; pass max_frames= or size= "
                f"to bound the read")
        out = np.empty((cap, h, w, 3), np.uint8)
        got = lib.mar_video_read(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            cap, w if size is not None else 0, h if size is not None else 0)
        if got < 0:
            raise IOError(f"mar_video_read failed for {path}")
        if got < cap or max_frames or n > 0:
            return out[:got]
        cap *= 4  # unknown count and the guess filled up: grow and redecode


def video_batch(paths: Sequence[str], frames: int, size: int,
                num_threads: int = 8) -> np.ndarray:
    """Threaded decode+resize to (N, frames, size, size, 3) uint8,
    zero-padded past each clip's end."""
    lib = load_video_library()
    if lib is None:
        raise RuntimeError("libmarvideo.so not built (make -C native)")
    n = len(paths)
    out = np.empty((n, frames, size, size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.mar_video_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        frames, size, size, num_threads)
    if failures:
        raise IOError(f"{failures} video files failed to decode")
    return out


def resample(x: np.ndarray, orig_rate: int, new_rate: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("libmarhost.so not built (make -C native)")
    x = np.ascontiguousarray(x, np.float32)
    cap = int(np.ceil(new_rate * len(x) / orig_rate)) + 16
    out = np.zeros(cap, np.float32)
    out_len = ctypes.c_long(0)
    rc = lib.mar_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), orig_rate,
        new_rate, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError("mar_resample buffer too small")
    return out[:out_len.value]
