"""Pallas TPU kernel: fused shift-roll + window partition for Swin3D.

XLA lowers `jnp.roll` to concat-of-slices; at swin3d_t stage0 shapes
((128,4,28,28,96) f32, H/W shift 3) the roll pair costs ~2.1 ms and the
partition/reverse transposes another ~0.9 ms — pure data movement worth
~0.25 ms of HBM traffic (benchmarks/profile_swin_parts.py,
proto_swin_levers.py).  The sublane-misaligned shift (3 rows against 8-row
tiles) is what XLA pays for; doing the whole permutation VMEM-resident
costs one HBM read + one write total.

This kernel fuses:  roll(-shift) -> pad-free window partition  (forward)
and                 window reverse -> roll(+shift)             (inverse)
into single Pallas calls, gridded over the batch axis: each step holds one
clip's (T, H, W, C) activation in VMEM, applies `pltpu.roll` on the H/W
axes, and emits the (nW, N, C) window block by static slicing.

Scope (falls back to the XLA path otherwise — models/swin3d.py):
  - zero T-shift (always true for <=16-frame windows: T' <= 8 clamps the
    (8,7,7) window's temporal shift to 0) and zero padding (H, W divisible
    by the window — true for 112px inputs at every stage);
  - TPU backend (interpret mode elsewhere keeps tests hermetic).

Exactness: pure data movement — bit-identical to roll+reshape+transpose
(tests/test_pallas_partition.py checks element equality).

Reference behavior: torchvision shifted_window_attention_3d's
torch.roll + window partition (consumed frozen via reference
models.py:49-59); same semantics, TPU-native data path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _partition_kernel(x_ref, o_ref, *, window, shift, nh, nw):
    wt, wh, ww = window
    x = x_ref[0]  # (T, H, W, C)
    if shift[1]:
        x = pltpu.roll(x, (-shift[1]) % x.shape[1], 1)
    if shift[2]:
        x = pltpu.roll(x, (-shift[2]) % x.shape[2], 2)
    c = x.shape[-1]
    for ih in range(nh):
        for iw in range(nw):
            win = x[:, ih * wh:(ih + 1) * wh, iw * ww:(iw + 1) * ww, :]
            o_ref[ih * nw + iw] = win.reshape(wt * wh * ww, c)


def _reverse_kernel(w_ref, o_ref, *, window, shift, nh, nw):
    wt, wh, ww = window
    c = w_ref.shape[-1]
    rows = []
    for ih in range(nh):
        row = [w_ref[ih * nw + iw].reshape(wt, wh, ww, c)
               for iw in range(nw)]
        rows.append(jnp.concatenate(row, axis=2))
    x = jnp.concatenate(rows, axis=1)  # (T, H, W, C)
    if shift[1]:
        x = pltpu.roll(x, shift[1], 1)
    if shift[2]:
        x = pltpu.roll(x, shift[2], 2)
    o_ref[0] = x


def _supported(t, h, w, window, shift):
    wt, wh, ww = window
    return (shift[0] == 0 and t == wt and h % wh == 0 and w % ww == 0)


@functools.partial(jax.jit,
                   static_argnames=("window", "shift", "interpret"))
def _partition_call(x, window, shift, interpret):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    nh, nw = h // wh, w // ww
    n = wt * wh * ww
    kernel = functools.partial(_partition_kernel, window=window, shift=shift,
                               nh=nh, nw=nw)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nh * nw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nh * nw, n, c), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _partition_op(x, window, shift):
    interpret = jax.default_backend() != "tpu"
    return _partition_call(x, window, shift, interpret)


def _partition_fwd(x, window, shift):
    return _partition_op(x, window, shift), x.shape


def _partition_bwd(window, shift, shape, g):
    # The op is a permutation; its transpose is the inverse permutation.
    b, t, h, w, _ = shape
    return (_reverse_op(g, window, shift, (b, t, h, w)),)


def shifted_window_partition(x, window, shift):
    """roll(-shift) + window partition, fused: (B,T,H,W,C) -> (B*nW, N, C).

    Falls back to `None` (caller uses the XLA path) when unsupported.
    """
    b, t, h, w, c = x.shape
    if not _supported(t, h, w, window, shift):
        return None
    return _partition_op(x, window, shift)


@functools.partial(jax.jit,
                   static_argnames=("window", "shift", "dims", "interpret"))
def _reverse_jit(windows, window, shift, dims, interpret):
    b, t, h, w = dims
    wt, wh, ww = window
    nh, nw = h // wh, w // ww
    n = wt * wh * ww
    c = windows.shape[-1]
    kernel = functools.partial(_reverse_kernel, window=window, shift=shift,
                               nh=nh, nw=nw)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((nh * nw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, c), windows.dtype),
        interpret=interpret,
    )(windows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _reverse_op(windows, window, shift, dims):
    interpret = jax.default_backend() != "tpu"
    return _reverse_jit(windows, window, shift, dims, interpret)


def _reverse_fwd(windows, window, shift, dims):
    return _reverse_op(windows, window, shift, dims), None


def _reverse_bwd(window, shift, dims, _, g):
    return (_partition_op(g, window, shift),)


_partition_op.defvjp(_partition_fwd, _partition_bwd)
_reverse_op.defvjp(_reverse_fwd, _reverse_bwd)


def shifted_window_reverse(windows, window, shift, b, t, h, w):
    """window reverse + roll(+shift), fused: (B*nW, N, C) -> (B,T,H,W,C)."""
    if not _supported(t, h, w, window, shift):
        return None
    return _reverse_op(windows, window, shift, (b, t, h, w))
