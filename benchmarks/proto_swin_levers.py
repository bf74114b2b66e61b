"""Prototype timings for the two remaining f32 Swin costs (round-3 VERDICT
item 1): the shifted-window roll pair and the C_in=3 patch embed.

Findings from run 1 (kept for the record):
  - perm-matmul roll+partition: 1.75 vs 3.07 ms current at stage0, but a
    single bf16 MXU pass rounds f32 values (err 1.6e-2) — not parity-exact.
  - pallas roll+partition (pltpu.roll + 16 window writes): 4.97 ms — small
    sublane-sliced writes dominate; pltpu.roll hardware direction also
    mismatched interpret mode.  Abandoned.

This run: (a) perm-matmul with Precision.HIGH (bf16x3 passes reconstruct
all 24 mantissa bits — exact for one-hot operands), (b) a roll-only Pallas
kernel (VMEM concat of static slices), (c) patch-embed variants.

Usage: python benchmarks/proto_swin_levers.py
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_all import _device_time  # noqa: E402


@functools.lru_cache(maxsize=32)
def roll_partition_perm(ph, pw, wh, ww, sh, sw):
    """(P, P) one-hot: row q (window-token order) <- plane position p,
    with the roll by (-sh, -sw) folded in."""
    nw = pw // ww
    p_mat = np.zeros((ph * pw, ph * pw), np.float32)
    q = 0
    for ih in range(ph // wh):
        for iw in range(nw):
            for lh in range(wh):
                for lw in range(ww):
                    src_h = (ih * wh + lh + sh) % ph
                    src_w = (iw * ww + lw + sw) % pw
                    p_mat[q, src_h * pw + src_w] = 1.0
                    q += 1
    return p_mat


def pallas_roll(x, sh, sw):
    """(B, T, H, W, C) circular roll by (-sh, -sw) on (H, W), VMEM concat."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, w, c = x.shape

    def kernel(x_ref, o_ref):
        v = x_ref[0]
        if sh:
            v = jnp.concatenate([v[:, sh:], v[:, :sh]], axis=1)
        if sw:
            v = jnp.concatenate([v[:, :, sw:], v[:, :, :sw]], axis=2)
        o_ref[0] = v

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import Precision

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        _window_partition, _window_reverse)

    report = {"device": str(jax.devices()[0])}

    def tm(name, fn, params, inputs, iters=50):
        ms = _device_time(fn, params, inputs, iters=iters) * 1e3
        report[name] = round(ms, 3)
        print(f"# {name}: {ms:.3f} ms", flush=True)

    rng = np.random.default_rng(0)

    for tag, (b, t, hw, c, wh) in {
            "s0": (128, 4, 28, 96, 7),
            "s1": (128, 4, 14, 192, 7)}.items():
        window = (t, wh, wh)
        sh = wh // 2
        x = jnp.asarray(rng.standard_normal((b, t, hw, hw, c)).astype(np.float32))

        def current(p, xx, window=window, sh=sh, b=b, t=t, hw=hw):
            xr = jnp.roll(xx, (-sh, -sh), axis=(2, 3))
            w = _window_partition(xr, window) * p
            xr = _window_reverse(w, window, b, t, hw, hw)
            return jnp.roll(xr, (sh, sh), axis=(2, 3))

        tm(f"{tag}_roll_partition_current", current, jnp.float32(1.000001), x)
        want_w = np.asarray(_window_partition(
            jnp.roll(x, (-sh, -sh), axis=(2, 3)), window))
        want_rt = np.asarray(x)

        perm = jnp.asarray(roll_partition_perm(hw, hw, wh, wh, sh, sh))
        nhw = (hw // wh) ** 2
        whww = wh * wh

        def fused_high(p, xx, perm=perm, b=b, t=t, hw=hw, c=c, nhw=nhw,
                       whww=whww):
            flat = xx.reshape(b, t, hw * hw, c)
            y = jax.lax.dot_general(
                perm, flat, (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=Precision.HIGH)
            y = y.reshape(nhw, whww, b, t, c)
            y = jnp.transpose(y, (2, 0, 3, 1, 4)).reshape(b * nhw, t * whww, c)
            y = y * p
            y = y.reshape(b, nhw, t, whww, c)
            y = jnp.transpose(y, (1, 3, 0, 2, 4)).reshape(nhw * whww, b, t, c)
            back = jax.lax.dot_general(
                perm, y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=Precision.HIGH)
            return jnp.transpose(back, (1, 2, 0, 3)).reshape(b, t, hw, hw, c)

        tm(f"{tag}_roll_partition_perm_high", fused_high,
           jnp.float32(1.000001), x)
        got = np.asarray(fused_high(jnp.float32(1.0), x))
        err = np.abs(got - want_rt).max()
        print(f"# {tag} perm-high roundtrip err {err}")
        report[f"{tag}_perm_high_err"] = float(err)

        def pallas_pair(p, xx, window=window, sh=sh, b=b, t=t, hw=hw):
            xr = pallas_roll(xx, sh, sh)
            w = _window_partition(xr, window) * p
            xr = _window_reverse(w, window, b, t, hw, hw)
            return pallas_roll(xr, hw - sh, hw - sh)

        tm(f"{tag}_roll_partition_pallasroll", pallas_pair,
           jnp.float32(1.000001), x)
        got = np.asarray(pallas_pair(jnp.float32(1.0), x))
        err = np.abs(got - want_rt).max()
        print(f"# {tag} pallas-roll roundtrip err {err}")
        got_w = np.asarray(_window_partition(pallas_roll(x, sh, sh), window))
        err_w = np.abs(got_w - want_w).max()
        print(f"# {tag} pallas-roll partition-vs-xla err {err_w}")
        report[f"{tag}_pallasroll_err"] = float(max(err, err_w))

    # ---- patch embed ----
    b, tt, hh, ww_, cin, cout = 128, 8, 112, 112, 3, 96
    x = jnp.asarray(rng.standard_normal((b, tt, hh, ww_, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((2, 4, 4, cin, cout)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))

    def pe_conv(params, xx):
        k, bb = params
        y = jax.lax.conv_general_dilated(
            xx, k, window_strides=(2, 4, 4), padding=[(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return y + bb

    tm("pe_conv", pe_conv, (kernel, bias), x, iters=30)
    want = np.asarray(pe_conv((kernel, bias), x))

    def pe_one_transpose(params, xx):
        k, bb = params
        xr = xx.reshape(b, tt // 2, 2, hh // 4, 4, ww_ // 4, 4, cin)
        xr = jnp.transpose(xr, (0, 1, 3, 5, 2, 4, 6, 7))
        xr = xr.reshape(b, tt // 2, hh // 4, ww_ // 4, 2 * 4 * 4 * cin)
        return jnp.dot(xr, k.reshape(-1, cout),
                       preferred_element_type=jnp.float32) + bb

    tm("pe_one_transpose", pe_one_transpose, (kernel, bias), x, iters=30)
    err = np.abs(np.asarray(pe_one_transpose((kernel, bias), x)) - want).max()
    print(f"# pe_one_transpose err {err}")

    def pe_staged(params, xx):
        k, bb = params
        y = xx.reshape(b, tt, hh, ww_ // 4, 4 * cin)            # (dw, c)
        y = y.reshape(b, tt, hh // 4, 4, ww_ // 4, 4 * cin)
        y = jnp.transpose(y, (0, 1, 2, 4, 3, 5))
        y = y.reshape(b, tt, hh // 4, ww_ // 4, 16 * cin)       # (dh, dw, c)
        y = y.reshape(b, tt // 2, 2, hh // 4, ww_ // 4, 16 * cin)
        y = jnp.transpose(y, (0, 1, 3, 4, 2, 5))
        y = y.reshape(b, tt // 2, hh // 4, ww_ // 4, 32 * cin)  # (dt, dh, dw, c)
        return jnp.dot(y, k.reshape(-1, cout),
                       preferred_element_type=jnp.float32) + bb

    tm("pe_staged", pe_staged, (kernel, bias), x, iters=30)
    err = np.abs(np.asarray(pe_staged((kernel, bias), x)) - want).max()
    print(f"# pe_staged err {err}")

    def pe_s2d_conv(params, xx):
        k, bb = params
        xr = xx.reshape(b, tt, hh // 2, 2, ww_ // 2, 2, cin)
        xr = jnp.transpose(xr, (0, 1, 2, 4, 3, 5, 6))
        xr = xr.reshape(b, tt, hh // 2, ww_ // 2, 4 * cin)
        kp = k.reshape(2, 2, 2, 2, 2, cin, cout)  # (dt, hp, hr, wp, wr, c, o)
        kp = jnp.transpose(kp, (0, 1, 3, 2, 4, 5, 6)).reshape(
            2, 2, 2, 4 * cin, cout)
        y = jax.lax.conv_general_dilated(
            xr, kp, window_strides=(2, 2, 2), padding=[(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return y + bb

    tm("pe_s2d_conv", pe_s2d_conv, (kernel, bias), x, iters=30)
    err = np.abs(np.asarray(pe_s2d_conv((kernel, bias), x)) - want).max()
    print(f"# pe_s2d_conv err {err}")

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
