"""Input-pipeline throughput: native C++ wav decode vs Python, thread scaling.

Measures the host-side data path in isolation (no device): WAV decode +
resample + fixed-shape batch assembly, the work the reference did inline in
__getitem__ with num_workers=0.  Usage: python benchmarks/bench_input_pipeline.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_wavs(root, n=64, seconds=5, rate=44100, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    paths = []
    for i in range(n):
        label = "AGGR" if i % 2 else "NOAGGR"
        p = os.path.join(root, f"clip{i}_{label}.wav")
        wavfile.write(p, rate, (rng.standard_normal(rate * seconds)
                                * 0.1 * 32767).astype(np.int16))
        paths.append(p)
    return paths


def main():
    from multimodalaggressionrecognition_tpu.data import native
    from multimodalaggressionrecognition_tpu.data.files import (
        FilenameLabelSource, RandomBatchSampler, _load_wav)
    from multimodalaggressionrecognition_tpu.data.pipeline import BatchLoader
    from multimodalaggressionrecognition_tpu.data.transforms import pad_audio

    with tempfile.TemporaryDirectory() as root:
        paths = make_wavs(root)
        n = len(paths)
        target = 16000 * 5
        results = {"files": n, "native_available": native.available()}

        # python (scipy + numpy polyphase) single thread
        t0 = time.perf_counter()
        for p in paths:
            pad_audio(target)(_load_wav(p, 16000))
        results["python_clips_per_sec"] = round(n / (time.perf_counter() - t0), 1)

        if native.available():
            t0 = time.perf_counter()
            for p in paths:
                native.wav_read(p, target, 16000)
            results["native_clips_per_sec"] = round(
                n / (time.perf_counter() - t0), 1)
            for threads in (2, 4, 8):
                t0 = time.perf_counter()
                native.wav_batch(paths, target, 16000, num_threads=threads)
                results[f"native_batch_{threads}t_clips_per_sec"] = round(
                    n / (time.perf_counter() - t0), 1)

        # full BatchLoader path (threaded source -> fixed-shape batches)
        src = FilenameLabelSource(root, "audio", transform=pad_audio(target))
        loader = BatchLoader(src, RandomBatchSampler(n, 16, False), pad_to=16,
                             num_threads=4)
        t0 = time.perf_counter()
        total = sum(int(b["sample_mask"].sum()) for b in loader)
        results["batch_loader_clips_per_sec"] = round(
            total / (time.perf_counter() - t0), 1)

        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
