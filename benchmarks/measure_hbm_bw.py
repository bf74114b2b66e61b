"""Measured-achievable HBM bandwidth calibration for the hbm_pct column.

bench_all.py's hbm_pct divides cost_analysis() "bytes accessed" by the
PAPER peak (819 GB/s on v5e).  Two problems make that column uncalibrated
(VERDICT r4 weak #4): (a) no copy kernel can actually reach paper peak, so
the denominator is optimistic; (b) "bytes accessed" sums every fusion's
external operands+outputs, so a buffer read by k fusions is counted k
times — rows can exceed 100% without being at any roofline.

This script measures (a) directly with streaming kernels whose true HBM
traffic is known exactly, on the live device:

  copy   : c = x0 + i             — traffic = 2x size (read x0, write c)
  triad  : c = c + x0 + x1        — traffic = 4x size (3 reads + 1 write)

Both run entirely on device (lax.fori_loop over distinct buffers, one
scalar readback per window — the same anti-hoisting discipline as
bench_all._device_time).  The per-iteration time is the DIFFERENCE between
a 4x-iteration window and a 1x window: the axon tunnel's ~130 ms dispatch
RTT is a fixed per-window cost comparable to the loop body itself at these
sizes, and differencing cancels it exactly.  The triad number is the
calibrated "achievable" bandwidth: what a perfectly-fused streaming op can
sustain.

Usage: python benchmarks/measure_hbm_bw.py [--mb 512] [--iters 30]
Prints one JSON dict; paste the result into results_v5e.json
"hbm_bw_measured" and read hbm_pct rows against it.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _window(run, args, windows=5):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = run(*args)
        float(jax_leaf(out))  # readback = the only reliable tunnel barrier
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaf(out):
    import jax

    return np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def measure(mb=512, iters=30, windows=5):
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = mb * (1 << 20) // 4  # f32 elements
    nbuf = 2
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((nbuf, n)).astype(np.float32))
    c0 = jax.device_put(np.zeros((n,), np.float32))

    # Hoisting discipline: every loop body must depend on the loop state —
    # jnp.sum(x0) alone is loop-invariant and XLA hoists it (measured: the
    # 4x window then does no extra work).  copy depends on i, triad on the
    # carried buffer; neither uses a dynamic slice of a 512 MB row (its own
    # memory op, pollutes the measurement).
    @partial(jax.jit, static_argnums=3)
    def copy_bw(x0, x1, c, k):
        def body(i, c):
            # read x0 + write c (2x size + one scalar read of the carry).
            # The c[0] dependence is load-bearing: with an i-only dependence
            # XLA collapses the loop to its final iteration (measured
            # "2.1x paper peak" before this fix).
            return x0 + c[0]

        c = jax.lax.fori_loop(0, k, body, c)
        return jnp.sum(c[:1])

    @partial(jax.jit, static_argnums=3)
    def triad_bw(x0, x1, c, k):
        def body(i, c):
            # fused read c, x0, x1 + write c' (4x size); carry-dependent
            return (c + x0) + x1

        c = jax.lax.fori_loop(0, k, body, c)
        return jnp.sum(c[:1])  # scalar readback dependency on the carry

    def per_iter(fn, state):
        # difference a 4x window against a 1x window: the tunnel's fixed
        # per-dispatch RTT (~130 ms, same order as the loop body here)
        # cancels exactly; only on-device loop time remains
        float(jax_leaf(fn(xs[0], xs[1], state, iters)))      # compile k=1x
        float(jax_leaf(fn(xs[0], xs[1], state, 4 * iters)))  # compile k=4x
        t1 = _window(fn, (xs[0], xs[1], state, iters), windows)
        t4 = _window(fn, (xs[0], xs[1], state, 4 * iters), windows)
        return (t4 - t1) / (3 * iters)

    size = 4.0 * n
    # per loop step: copy moves 2x size (1 read + 1 write); the fused triad
    # c+x0+x1 reads 3 buffers and writes 1 (4x size)
    t_copy = per_iter(copy_bw, c0)
    t_triad = per_iter(triad_bw, c0)
    dev = jax.devices()[0]
    return {
        "device": dev.device_kind,
        "buffer_mb": mb,
        "iters_per_window": iters,
        "copy_gbps": round(2.0 * size / t_copy / 1e9, 1),
        "triad_gbps": round(4.0 * size / t_triad / 1e9, 1),
        "paper_peak_gbps": 819.0,
        "note": ("triad_gbps is the calibrated achievable-HBM denominator; "
                 "hbm_pct rows in results_v5e.json use paper peak and a "
                 "fusion-operand byte count that can double-count shared "
                 "buffers (rows >100% are cost-model overcounts, not "
                 "physics)"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(json.dumps(measure(args.mb, args.iters)))


if __name__ == "__main__":
    main()
