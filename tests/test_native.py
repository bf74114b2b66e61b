"""Native host library (libmarhost.so): parity with the Python pipeline."""

import os
import subprocess

import numpy as np
import pytest
from scipy.io import wavfile

from multimodalaggressionrecognition_tpu.data import native
from multimodalaggressionrecognition_tpu.ops.resample import resample_poly_np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not native.available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
        native._TRIED = False
    assert native.available()


def _write_wav(path, rate, data, dtype=np.int16):
    if dtype == np.int16:
        wavfile.write(path, rate, (data * 32767).astype(np.int16))
    else:
        wavfile.write(path, rate, data.astype(np.float32))


def test_wav_read_matches_python(tmp_path, rng):
    data = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    path = str(tmp_path / "a.wav")
    _write_wav(path, 44100, data)
    got = native.wav_read(path, target_len=16000, target_rate=16000)
    # python reference: int16 quantized -> resample -> pad
    q = (data * 32767).astype(np.int16) / 32768.0
    ref = resample_poly_np(q.astype(np.float32), 44100, 16000)
    n = min(len(ref), 16000)
    np.testing.assert_allclose(got[:n], ref[:n], atol=2e-3)
    assert np.all(got[n:] == 0)


def test_wav_read_float32(tmp_path, rng):
    data = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    path = str(tmp_path / "f.wav")
    _write_wav(path, 16000, data, dtype=np.float32)
    got = native.wav_read(path, target_len=8000, target_rate=16000)
    np.testing.assert_allclose(got, data, atol=1e-6)


def test_wav_batch_threads(tmp_path, rng):
    paths = []
    refs = []
    for i in range(6):
        data = (rng.standard_normal(16000) * 0.2).astype(np.float32)
        p = str(tmp_path / f"b{i}.wav")
        _write_wav(p, 16000, data, dtype=np.float32)
        paths.append(p)
        refs.append(data[:8000])
    batch = native.wav_batch(paths, target_len=8000, target_rate=16000,
                             num_threads=3)
    assert batch.shape == (6, 8000)
    for i in range(6):
        np.testing.assert_allclose(batch[i], refs[i], atol=1e-6)


def test_resample_matches_python(rng):
    x = (rng.standard_normal(4000) * 0.5).astype(np.float32)
    got = native.resample(x, 44100, 16000)
    ref = resample_poly_np(x, 44100, 16000)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
