"""Pallas TPU kernel: fused strided-conv1d / framing matmul.

The XLA path (ops/framing.py) materializes the (B, T, K) frame matrix in HBM
— K/hop x the waveform's footprint (4x for the CNN1D stem, reference
models.py:934) — before the MXU matmul.  This kernel builds frames *in VMEM*
from static shifted slices of hop-sized rows, so HBM traffic is exactly the
waveform in + features out, with an optional fused scale/shift/ReLU epilogue
(inference-mode Conv+BN+ReLU in one pass).

Framing identity (any kernel length F, any hop):
  rows  = pad(x).reshape(N, hop)
  frame[t] = concat(rows[t], rows[t+1], ..., rows[t+n_shift-1])[:F],
  n_shift = ceil(F / hop)
so a T-tile of frames is n_shift static slices of a (TILE+n_shift-1, hop)
rows block.  Consecutive tiles overlap by n_shift-1 rows, so the rows tile
is DMA'd from HBM by explicit async copy (overlapping windows are not
expressible with blocked BlockSpecs).

Covers: CNN1D stem (F=160, hop=40), wav2vec2 stem (10, 5), STFT (512, 256),
polyphase resample (2*width+orig_g, orig_g).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_hbm, w_ref, b_ref, scale_ref, shift_ref, out_ref, *,
            tile_t: int, n_shift: int, relu: bool):
    # frames @ W decomposes as sum_k rows[t+k] @ W[k*hop:(k+1)*hop] — no
    # lane-concat of offset slices (which Mosaic cannot relayout), just
    # n_shift accumulated MXU matmuls on sublane-shifted views.
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows_tile = tile_t + n_shift - 1

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            rows_hbm.at[i, pl.ds(j * tile_t, rows_tile), :], scratch, sem)
        dma.start()
        dma.wait()
        y = jnp.dot(scratch[0:tile_t], w_ref[0],
                    preferred_element_type=jnp.float32)
        for k in range(1, n_shift):
            y = y + jnp.dot(scratch[k:k + tile_t], w_ref[k],
                            preferred_element_type=jnp.float32)
        y = y + b_ref[:]
        y = y * scale_ref[:] + shift_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0] = y

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((rows_tile, rows_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=(
    "kernel_size", "stride", "pad", "relu", "tile_t", "interpret"))
def framed_conv1d_pallas(x, weight, bias, kernel_size: int, stride: int,
                         pad: int = 0, scale=None, shift=None,
                         relu: bool = False, tile_t: int = 256,
                         interpret: bool = False):
    """Strided conv over (B, L) single-channel input -> (B, T, C_out).

    weight (kernel_size, C_out); bias (C_out,); optional per-channel
    scale/shift epilogue (folded BatchNorm) and ReLU.
    """
    b, length = x.shape
    c_out = weight.shape[1]
    t_out = (length + 2 * pad - kernel_size) // stride + 1
    n_shift = -(-kernel_size // stride)
    t_tiles = -(-t_out // tile_t)
    rows_needed = t_tiles * tile_t + n_shift - 1
    total = rows_needed * stride
    xp = jnp.pad(x, ((0, 0), (pad, max(0, total - length - pad))))
    rows = xp[:, :total].reshape(b, rows_needed, stride)

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
            pl.BlockSpec(memory_space=pltpu.ANY),  # rows stay in HBM
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
    )(rows, w_slabs, bias, scale, shift)
    return out[:, :t_out]
