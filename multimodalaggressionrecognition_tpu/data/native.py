"""ctypes bindings for the native host library (native/marhost.cpp).

Provides C++-speed WAV decode + polyphase resample + threaded batch assembly
for the input pipeline; falls back to the scipy/numpy path
(data/files.py::_load_wav) when the shared library hasn't been built.
Build with `make -C native` (g++, no external deps).
"""

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native", "libmarhost.so")


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
