"""Benchmark: end-to-end multimodal forward clips/sec/chip vs torch-CPU reference.

Measures the flagship PhysVerb multimodal forward (audio CNN1D tower over
80 000-sample waveforms + 48x768 text embeddings + fusion transformer +
both aggression heads, batch 32) on the default JAX device, and the same
computation as a PyTorch-CPU model (the reference implementation style) for
the baseline.  Prints ONE JSON line:
  {"metric": ..., "value": clips/s, "unit": "clips/s", "vs_baseline": ratio}

BASELINE.md north star: >=5x reference PyTorch-CPU clips/sec on one v5e chip.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 32
AUDIO_LEN = 80000
TEXT_LEN = 48
HIDDEN = 768
WARMUP = 5
ITERS = 100
WINDOWS = 3
TORCH_WARMUP = 3
TORCH_ITERS = 20


def bench_jax():
    """On-device steady-state throughput, best of WINDOWS timed windows.

    Host-side per-call dispatch through the axon tunnel is noisy and can
    dominate sub-ms steps, and block_until_ready is not a reliable
    completion barrier (a device->host readback is, ~130 ms RTT).  So the
    whole ITERS-iteration loop runs ON DEVICE in one jitted call —
    lax.fori_loop cycling over NBUF pre-staged distinct input batches,
    carrying a data dependency so no iteration can be elided — and each
    window is timed by one dispatch + one scalar readback.  This measures
    pure chip throughput, which is the deployable number: in serving,
    dispatch overlaps compute via async enqueue.
    """
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR)

    cache_dir = os.environ.get("MAR_BENCH_CACHE",
                               os.path.expanduser(DEFAULT_CACHE_DIR))
    if cache_dir:
        from multimodalaggressionrecognition_tpu.utils.compile_cache import (
            enable_compilation_cache)

        enable_compilation_cache(cache_dir)

    from __graft_entry__ import _batch, _flagship

    pallas = jax.default_backend() == "tpu"
    model = _flagship(hidden=HIDDEN, audio_len=AUDIO_LEN, text_len=TEXT_LEN,
                      pallas_stem=pallas)
    nbuf = 8
    host = [_batch(BATCH, AUDIO_LEN, TEXT_LEN, HIDDEN, seed=s)
            for s in range(nbuf)]
    stacked = jax.tree.map(
        lambda *xs: jax.device_put(np.stack(xs)), *host)
    variables = model.init(jax.random.PRNGKey(0), host[0])

    @jax.jit
    def run_many(variables, stacked, carry):
        def body(i, c):
            batch = jax.tree.map(lambda a: a[i % nbuf], stacked)
            out = model.apply(variables, batch)
            return c + jnp.sum(out["verb"]) + jnp.sum(out["phys"])

        return jax.lax.fori_loop(0, ITERS, body, carry)

    for _ in range(WARMUP):
        warm = run_many(variables, stacked, jnp.float32(0))
    float(warm)
    best_dt = float("inf")
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        got = run_many(variables, stacked, jnp.float32(w))
        float(got)  # readback = completion barrier
        best_dt = min(best_dt, (time.perf_counter() - t0) / ITERS)
    return BATCH / best_dt


def bench_torch_cpu():
    import torch
    from torch import nn

    torch.set_num_threads(max(1, (torch.get_num_threads())))

    def conv_block(cin, cout, pool=True):
        layers = [nn.Conv1d(cin, cout, 3, padding=1), nn.BatchNorm1d(cout), nn.ReLU(),
                  nn.Conv1d(cout, cout, 3, padding=1), nn.BatchNorm1d(cout), nn.ReLU()]
        if pool:
            layers.append(nn.MaxPool1d(4, 4))
        layers.append(nn.Dropout1d(0.1))
        return layers

    class AudioTower(nn.Module):
        def __init__(self):
            super().__init__()
            self.extractor = nn.Sequential(
                nn.Conv1d(1, 64, 160, stride=40, padding=80),
                nn.BatchNorm1d(64), nn.ReLU(), nn.MaxPool1d(4, 4), nn.Dropout1d(0.1),
                *conv_block(64, 64), *conv_block(64, 128), *conv_block(128, 256),
                *conv_block(256, 512, pool=False))
            self.adaptor = nn.Sequential(nn.Linear(512, HIDDEN), nn.ReLU(), nn.Dropout(0.3))

        def forward(self, x):
            return self.adaptor(self.extractor(x).permute(0, 2, 1))

    class Flagship(nn.Module):
        def __init__(self):
            super().__init__()
            self.audio = AudioTower()
            layer = nn.TransformerEncoderLayer(d_model=HIDDEN, nhead=8, batch_first=True)
            self.fusion = nn.TransformerEncoder(layer, 1, norm=nn.LayerNorm(HIDDEN))
            self.adapt_a = nn.Sequential(nn.Linear(HIDDEN, 256), nn.Dropout(0.3), nn.ReLU())
            self.adapt_t = nn.Sequential(nn.Linear(HIDDEN, 256), nn.Dropout(0.3), nn.ReLU())
            self.head_phys = nn.Sequential(nn.Linear(512, 170), nn.ReLU(),
                                           nn.Dropout(0.3), nn.Linear(170, 2))
            self.head_verb = nn.Sequential(nn.Linear(512, 170), nn.ReLU(),
                                           nn.Dropout(0.3), nn.Linear(170, 2))

        def forward(self, wav, text):
            a = self.audio(wav)
            concat = torch.cat([a, text], dim=1)
            mask = concat.sum(dim=2) == 0
            fused = self.fusion(concat, src_key_padding_mask=mask)
            fa = self.adapt_a(fused[:, :a.shape[1]]).mean(1)
            ft = self.adapt_t(fused[:, a.shape[1]:]).mean(1)
            h = torch.cat([fa, ft], dim=1)
            return self.head_phys(h), self.head_verb(h)

    model = Flagship().eval()
    rng = np.random.default_rng(0)
    wav = torch.from_numpy(rng.standard_normal((BATCH, 1, AUDIO_LEN)).astype(np.float32) * 0.1)
    text = torch.from_numpy(rng.standard_normal((BATCH, TEXT_LEN, HIDDEN)).astype(np.float32))
    with torch.no_grad():
        for _ in range(TORCH_WARMUP):
            model(wav, text)
        t0 = time.perf_counter()
        for _ in range(TORCH_ITERS):
            model(wav, text)
        dt = (time.perf_counter() - t0) / TORCH_ITERS
    return BATCH / dt


def _torch_baseline_subprocess(runs=3):
    """Median torch-CPU baseline over `runs` clean child processes (no JAX
    initialized, no thread-pool contention from the JAX runtime).  Median of
    independent processes because a single contended run can collapse the
    baseline ~8x and silently inflate vs_baseline (BENCH_r04: 2739x vs the
    326-360x of r01-r03)."""
    vals = []
    for _ in range(runs):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--torch-baseline"],
            capture_output=True, text=True, timeout=900)
        if proc.returncode != 0:
            raise RuntimeError(f"torch baseline failed: {proc.stderr[-1000:]}")
        vals.append(float(proc.stdout.strip().splitlines()[-1]))
    return float(np.median(vals)), vals


def _baseline_pin():
    """The committed torch-CPU reference for this bench's exact workload
    (benchmarks/results_v5e.json 'bench_py_torch_cpu_pin'): median of clean
    idle-host subprocess runs, pinned so a contended live measurement is
    detectable instead of silently scaling vs_baseline."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "results_v5e.json")) as f:
            return float(json.load(f)["bench_py_torch_cpu_pin"]["clips_per_sec"])
    except Exception:
        return None


def _resolve_baseline(live_median, live_runs, pin, max_drift=1.5):
    """(baseline_used, extra JSON fields).  The live median is used unless it
    drifts >max_drift x from the committed pin — then the pin is used (the
    defensible idle-host number) and the drift is reported, so the printed
    ratio is always explainable from committed data."""
    extra = {"baseline_clips_per_sec": round(live_median, 2),
             "baseline_runs": [round(v, 2) for v in live_runs]}
    if pin is not None:
        extra["baseline_pin_clips_per_sec"] = round(pin, 2)
        drift = max(live_median / pin, pin / live_median)
        if drift > max_drift:
            extra["baseline_note"] = (
                f"live torch baseline drifted {drift:.2f}x from the committed "
                "pin (host contention?); vs_baseline uses the pin")
            return pin, extra
    return live_median, extra


def _probe_backend(timeout=240):
    """Bounded device-backend probe in a child process: a down axon tunnel
    makes jax.devices() hang indefinitely, which would hang this whole
    benchmark; better to print a diagnosable JSON line and exit nonzero."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True, timeout=timeout)
        return proc.returncode == 0, proc.stderr[-300:]
    except subprocess.TimeoutExpired:
        return False, f"jax.devices() did not return within {timeout}s"


def _result_line(jax_cps, baseline, extra):
    return {
        "metric": "multimodal_fwd_clips_per_sec_per_chip",
        "value": round(jax_cps, 2),
        "unit": "clips/s",
        "vs_baseline": round(jax_cps / baseline, 2),
        **extra,
    }


def main():
    if "--torch-baseline" in sys.argv:
        print(bench_torch_cpu())
        return
    if "--schema-check" in sys.argv:
        # contract-lane mode: print the exact success-path JSON line with
        # stub numbers — no device, no torch, no measurement (make
        # test-contract validates the driver's one-JSON-line schema)
        baseline, extra = _resolve_baseline(125.0, [124.0, 125.0, 126.0],
                                            _baseline_pin())
        print(json.dumps(_result_line(44000.0, baseline, extra)))
        return
    ok, err = _probe_backend()
    if not ok:
        # still ONE JSON line; value 0.0 says "no live measurement" honestly,
        # and last_verified_on_device gives the reviewer the most recent real
        # v5e number (benchmarks/results_v5e.json) for context
        last = None
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "benchmarks", "results_v5e.json")) as f:
                last = json.load(f).get("5_multimodal", {}).get(
                    "fwd_clips_per_sec")
        except Exception:
            pass
        print(json.dumps({
            "metric": "multimodal_fwd_clips_per_sec_per_chip",
            "value": 0.0, "unit": "clips/s", "vs_baseline": 0.0,
            "error": f"device backend unavailable: {err.strip()}",
            "last_verified_on_device": last}))
        sys.exit(1)
    live_median, live_runs = _torch_baseline_subprocess()
    baseline, extra = _resolve_baseline(live_median, live_runs, _baseline_pin())
    jax_cps = bench_jax()
    print(json.dumps(_result_line(jax_cps, baseline, extra)))


if __name__ == "__main__":
    main()
