"""Pallas TPU kernel: fused strided-conv1d / framing matmul.

The XLA path (ops/framing.py) materializes the (B, T, K) frame matrix in HBM
— K/hop x the waveform's footprint (4x for the CNN1D stem, reference
models.py:934) — before the MXU matmul.  This kernel reads the waveform once
and forms frames implicitly in VMEM, with an optional fused scale/shift/ReLU
epilogue (inference-mode Conv+BN+ReLU in one pass).

Framing identity (any kernel length F, any hop):
  rows  = pad(x).reshape(N, hop)
  frame[t] = concat(rows[t], ..., rows[t + n_shift - 1])[:F],
  n_shift = ceil(F / hop)
and therefore
  frames @ W = sum_k rows[t+k] @ W[k*hop:(k+1)*hop]
— n_shift accumulated MXU matmuls on sublane-shifted row views.  Mosaic
constraints shaped this: lane-concat of offset slices and manual DMA with a
non-128 lane dim are both unsupported, so each tile arrives as two *blocked*
fetches (tile j and j+1) that are sublane-concatenated, and the per-shift
views are static sublane slices.

Covers: CNN1D stem (F=160, hop=40), wav2vec2 stem (10, 5), STFT (512, 256),
polyphase resample (2*width+orig_g, orig_g).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, next_ref, w_ref, b_ref, scale_ref, shift_ref, out_ref, *,
            tile_t: int, n_shift: int, relu: bool):
    a = rows_ref[0]                      # (tile_t, hop)
    if n_shift > 1:
        tail = next_ref[0][:n_shift - 1]  # first rows of the next tile
        full = jnp.concatenate([a, tail], axis=0)
    else:
        full = a
    y = jnp.dot(full[0:tile_t], w_ref[0], preferred_element_type=jnp.float32)
    for k in range(1, n_shift):
        y = y + jnp.dot(full[k:k + tile_t], w_ref[k],
                        preferred_element_type=jnp.float32)
    y = y + b_ref[:]
    y = y * scale_ref[:] + shift_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y


@functools.partial(jax.jit, static_argnames=(
    "kernel_size", "stride", "pad", "relu", "tile_t", "interpret"))
def framed_conv1d_pallas(x, weight, bias, kernel_size: int, stride: int,
                         pad: int = 0, scale=None, shift=None,
                         relu: bool = False, tile_t: int = 512,
                         interpret: bool | None = None):
    """Strided conv over (B, L) single-channel input -> (B, T, C_out).

    weight (kernel_size, C_out); bias (C_out,); optional per-channel
    scale/shift epilogue (folded BatchNorm) and ReLU.
    """
    if interpret is None:  # auto: compiled on TPU, interpreter elsewhere
        interpret = jax.default_backend() != "tpu"
    b, length = x.shape
    c_out = weight.shape[1]
    t_out = (length + 2 * pad - kernel_size) // stride + 1
    n_shift = -(-kernel_size // stride)
    t_tiles = -(-t_out // tile_t)
    # one extra tile so block j+1 exists for the last tile's overlap rows
    rows_total = (t_tiles + 1) * tile_t
    total = rows_total * stride
    xp = jnp.pad(x, ((0, 0), (pad, max(0, total - length - pad))))
    rows = xp[:, :total].reshape(b, rows_total, stride)

    if scale is None:
        scale = jnp.ones((c_out,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((c_out,), jnp.float32)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (c_out,))
    shift = jnp.broadcast_to(jnp.asarray(shift, jnp.float32), (c_out,))

    # weight (F, C_out) -> per-shift slabs (n_shift, hop, C_out), zero-padded
    w_pad = jnp.pad(weight, ((0, n_shift * stride - kernel_size), (0, 0)))
    w_slabs = w_pad.reshape(n_shift, stride, c_out)

    kernel = functools.partial(_kernel, tile_t=tile_t, n_shift=n_shift,
                               relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_t, stride), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, stride), lambda i, j: (i, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_shift, stride, c_out), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles * tile_t, c_out),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_out * kernel_size * c_out,
            bytes_accessed=4 * (b * length + b * t_out * c_out
                                + kernel_size * c_out),
            transcendentals=0),
        interpret=interpret,
    )(rows, rows, w_slabs, bias, scale, shift)
    return out[:, :t_out]


def framed_conv1d_grouped(x, weight, bias, kernel_size: int, stride: int,
                          pad: int = 0, group: int = 16, **kw):
    """Lane-aligned variant: compute `group` consecutive outputs per frame.

    Small hops (e.g. 40) leave the kernel's lane dims badly under-aligned
    (Mosaic pads 40 -> 128 on loads, 64 -> 128 on stores).  Densification:
    treat G consecutive outputs as one super-output — frame length
    F' = F + (G-1)*s, hop' = G*s, C_out' = G*C_out, with a block-banded
    super-weight W'[j, g*C + c] = W[j - g*s, c].  For the CNN1D stem with
    G=16: hop' = 640 = 5x128 lanes, C_out' = 1024 — fully aligned, at the
    cost of (F'/F)x redundant FLOPs on an otherwise idle MXU.
    """
    f, c_out = weight.shape
    f_super = f + (group - 1) * stride
    # W'[j, g*C + c] = W[j - g*s, c]
    w_super = jnp.zeros((f_super, group * c_out), weight.dtype)
    for g in range(group):
        w_super = w_super.at[g * stride:g * stride + f,
                             g * c_out:(g + 1) * c_out].set(weight)
    b_super = jnp.tile(bias, group)
    t_out = (x.shape[-1] + 2 * pad - kernel_size) // stride + 1
    t_super_needed = -(-t_out // group)
    # right-pad so the last (partial) super-frame exists
    need = (t_super_needed - 1) * group * stride + f_super - 2 * pad
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    y = framed_conv1d_pallas(x, w_super, b_super, f_super, group * stride,
                             pad=pad, **kw)
    bsz, t_super, _ = y.shape
    y = y.reshape(bsz, t_super * group, c_out)
    return y[:, :t_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def framed_conv1d(x, weight, bias, kernel_size: int, stride: int,
                  pad: int = 0):
    """Differentiable fused conv: Pallas forward, XLA backward.

    Forward uses the grouped lane-aligned variant (group=8: on the CNN1D
    stem 333us vs 425us plain / 979us XLA on v5e).  Backward uses the same
    framing identity: with rows = pad(x).reshape(N, hop) and per-shift
    weight slabs W_k,
      d_rows[t+k] += g[t] @ W_k^T      (accumulated shifts)
      d_W_k       = rows[t+k]^T @ g    (one matmul per shift)
    """
    return framed_conv1d_grouped(x, weight, bias, kernel_size, stride, pad,
                                 group=8)


def _rows_of(x, kernel_size, stride, pad, t_out):
    n_shift = -(-kernel_size // stride)
    rows_needed = t_out + n_shift - 1
    total = rows_needed * stride
    length = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, max(0, total - length - pad))))
    return xp[:, :total].reshape(x.shape[0], rows_needed, stride), n_shift


def _fwd(x, weight, bias, kernel_size, stride, pad):
    y = framed_conv1d_grouped(x, weight, bias, kernel_size, stride, pad,
                              group=8)
    return y, (x, weight)


def _bwd(kernel_size, stride, pad, res, g):
    x, weight = res
    b, length = x.shape
    c_out = weight.shape[1]
    t_out = g.shape[1]
    rows, n_shift = _rows_of(x, kernel_size, stride, pad, t_out)
    w_pad = jnp.pad(weight, ((0, n_shift * stride - kernel_size), (0, 0)))
    w_slabs = w_pad.reshape(n_shift, stride, c_out)

    d_rows = jnp.zeros_like(rows)
    dw_slabs = []
    for k in range(n_shift):
        d_rows = d_rows.at[:, k:k + t_out].add(
            jnp.einsum("btc,hc->bth", g, w_slabs[k],
                       preferred_element_type=jnp.float32))
        dw_slabs.append(jnp.einsum("bth,btc->hc", rows[:, k:k + t_out], g,
                                   preferred_element_type=jnp.float32))
    d_weight = jnp.concatenate(dw_slabs, axis=0)[:kernel_size]
    d_bias = jnp.sum(g, axis=(0, 1))
    d_flat = d_rows.reshape(b, -1)
    dx = d_flat[:, pad:pad + length]
    if dx.shape[1] < length:  # tail beyond the padded window got no gradient
        dx = jnp.pad(dx, ((0, 0), (0, length - dx.shape[1])))
    return dx, d_weight, d_bias


framed_conv1d.defvjp(_fwd, _bwd)
