"""Prototype timings for the two remaining f32 Swin costs (round-3 VERDICT
item 1): the shifted-window roll pair and the C_in=3 patch embed.

Variants
  roll: (a) jnp.roll pair + transpose partition/reverse (current)
        (b) one-hot permutation matmul fusing roll+partition (MXU does the
            data movement; one-hot f32 matmul is EXACT)
  patch-embed: (a) Conv3d(3->96,(2,4,4),s=(2,4,4)) (current)
               (b) single reshape/transpose/matmul
               (c) staged lane-growing reshapes (12 -> 48 -> 96) + matmul
               (d) 2x2 spatial s2d (C=12) + packed conv

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


def main():
    import jax
    import jax.numpy as jnp

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
            "s1": (128, 4, 14, 192, 7),
            "s2": (128, 4, 7, 384, 7)}.items():
        window = (t, wh, wh) if hw >= wh else (t, hw, hw)
        sh = wh // 2 if hw > wh else 0
        x = jnp.asarray(rng.standard_normal((b, t, hw, hw, c)).astype(np.float32))

        def current(p, xx, window=window, sh=sh, b=b, t=t, hw=hw):
            xr = jnp.roll(xx, (-sh, -sh), axis=(2, 3))
            w = _window_partition(xr, window) * p
            xr = _window_reverse(w, window, b, t, hw, hw)
            return jnp.roll(xr, (sh, sh), axis=(2, 3))

        tm(f"{tag}_roll_partition_current", current, jnp.float32(1.000001), x)

        perm = jnp.asarray(roll_partition_perm(hw, hw, window[1], window[2],
                                               sh, sh))
        nhw = (hw // window[1]) ** 2
        whww = window[1] * window[2]

        def fused(p, xx, perm=perm, b=b, t=t, hw=hw, c=c, nhw=nhw, whww=whww):
            flat = xx.reshape(b, t, hw * hw, c)
            y = jax.lax.dot_general(
                perm, flat, (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32)  # (q, b, t, c)
            y = y.reshape(nhw, whww, b, t, c)
            y = jnp.transpose(y, (2, 0, 3, 1, 4)).reshape(b * nhw, t * whww, c)
            y = y * p
            # reverse
            y = y.reshape(b, nhw, t, whww, c)
            y = jnp.transpose(y, (1, 3, 0, 2, 4)).reshape(nhw * whww, b, t, c)
            back = jax.lax.dot_general(
                perm, y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (p, b, t, c)
            return jnp.transpose(back, (1, 2, 0, 3)).reshape(b, t, hw, hw, c)

        tm(f"{tag}_roll_partition_permmm", fused, jnp.float32(1.000001), x)

        # correctness
        got = np.asarray(fused(jnp.float32(1.0), x))
        want = np.asarray(current(jnp.float32(1.0), x))
        err = np.abs(got - want).max()
        print(f"# {tag} perm-mm exact: max err {err}")
        assert err == 0.0, err

        # batch-on-left variant: (b*t, hw*hw, c) x perm^T via dot_general
        def fused2(p, xx, perm=perm, b=b, t=t, hw=hw, c=c, nhw=nhw, whww=whww):
            flat = xx.reshape(b * t, hw * hw, c)
            y = jax.lax.dot_general(
                flat, perm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bt, c, q)
            y = y.reshape(b, t, c, nhw, whww)
            y = jnp.transpose(y, (0, 3, 1, 4, 2)).reshape(b * nhw, t * whww, c)
            y = y * p
            y = y.reshape(b, nhw, t, whww, c)
            y = jnp.transpose(y, (0, 2, 4, 1, 3)).reshape(b * t, c, nhw * whww)
            back = jax.lax.dot_general(
                y, perm, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bt, c, p)
            return jnp.transpose(back.reshape(b, t, c, hw, hw), (0, 1, 3, 4, 2))

        tm(f"{tag}_roll_partition_permmm2", fused2, jnp.float32(1.000001), x)
        got = np.asarray(fused2(jnp.float32(1.0), x))
        assert np.array_equal(got, want)

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
        kp = k.reshape(2, 2, 2, 2, 2, cin, cout)  # (dt, hy, hr, wy, wr, c, o)
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
