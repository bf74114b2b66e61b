"""Overlapping-frame extraction and frame×filter matmul.

This is the shared primitive behind the framework's audio front-ends: a
strided Conv1d over a raw waveform (the reference CNN1D stem, reference
models.py:934, and the wav2vec-style conv encoder) is exactly

    frames = frame_signal(x, kernel, stride)        # (B, T_out, K*C_in)
    y      = frames @ W + b                          # MXU matmul

which maps the hot op onto the TPU MXU as one large matmul instead of a
shape-shifting convolution.  The same framing feeds the STFT (ops/stft.py)
and the polyphase resampler (ops/resample.py).
"""

import jax
import jax.numpy as jnp


def frame_signal(x, frame_len: int, hop: int, pad: int = 0):
    """Slice `x` (..., L) into overlapping frames: (..., T, frame_len).

    `pad` zero-pads both ends of the signal first (conv 'padding' semantics).
    T = (L + 2*pad - frame_len) // hop + 1.
    """
    if pad:
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths)
    length = x.shape[-1]
    num_frames = (length - frame_len) // hop + 1
    # Gather-free framing: reshape tricks only work when hop divides frame_len;
    # the general path uses a strided gather which XLA lowers to efficient
    # dynamic slices.
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return x[..., idx]


def framed_matmul(x, weight, bias, kernel_size: int, stride: int, pad: int = 0,
                  preferred_dtype=jnp.float32):
    """Strided 1-D convolution with C_in channels as one MXU matmul.

    x:      (B, L, C_in)   channels-last waveform/features
    weight: (kernel_size * C_in, C_out)  — frame-major flattening, i.e. the
            torch Conv1d weight (C_out, C_in, K) maps via
            w.transpose(2, 1, 0).reshape(K*C_in, C_out).
    bias:   (C_out,) or None
    returns (B, T_out, C_out)
    """
    b, length, c_in = x.shape
    frames = frame_signal(jnp.swapaxes(x, -1, -2), kernel_size, stride, pad)
    # frames: (B, C_in, T, K) -> (B, T, K, C_in) -> (B, T, K*C_in)
    frames = jnp.transpose(frames, (0, 2, 3, 1))
    t_out = frames.shape[1]
    frames = frames.reshape(b, t_out, kernel_size * c_in)
    y = jax.lax.dot_general(
        frames, weight,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        y = y + bias
    return y
