"""Spectrogram and SpecAugment-style masking as fixed-shape XLA ops.

Replaces the reference's torchaudio C++ ops (reference datasets.py:611,
train_audio_transformer.py:97-108: `Spectrogram(n_fft=512)`,
`FrequencyMasking`, `TimeMasking`).  The STFT is expressed as framing + two
MXU matmuls against precomputed DFT bases — there is no FFT primitive needed;
for n_fft=512 the (512, 257) matmuls are an excellent fit for the 128x128
systolic array and XLA fuses the |.|^2 epilogue.

Semantics match torchaudio defaults: win_length = n_fft, hop = n_fft // 2,
periodic Hann window, center=True with reflect padding, onesided, power=2.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal


# numpy-only cache: caching jnp arrays would store tracers when first
# called under a jit/eval_shape trace and leak them into later traces
@functools.lru_cache(maxsize=8)
def _dft_bases_np(n_fft: int):
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    angle = -2.0 * np.pi * n * f / n_fft
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    real = np.cos(angle) * window[:, None]
    imag = np.sin(angle) * window[:, None]
    return real.astype(np.float32), imag.astype(np.float32)


def _dft_bases(n_fft: int):
    real, imag = _dft_bases_np(n_fft)
    return jnp.asarray(real), jnp.asarray(imag)


def spectrogram(x, n_fft: int = 512, hop: int | None = None, power: float = 2.0,
                use_pallas: bool | None = None):
    """Power spectrogram of x (..., L) -> (..., n_freq, T).

    T = L // hop + 1 (center=True).  Output layout (freq, time) matches the
    reference so its (B, F, T) -> 3-channel image stacking carries over.
    On TPU the framing+DFT matmul runs through the fused Pallas kernel
    (frames formed in VMEM, never materialized in HBM).
    """
    import jax

    hop = n_fft // 2 if hop is None else hop
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    real_b, imag_b = _dft_bases(n_fft)
    if use_pallas is None:
        from ..utils.kernels import pallas_auto

        use_pallas = pallas_auto()
    n_freq = n_fft // 2 + 1
    if use_pallas and x.ndim >= 2:
        from .pallas.framed_conv import framed_conv1d_pallas

        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        basis = jnp.concatenate([real_b, imag_b], axis=1)  # (n_fft, 2*n_freq)
        y = framed_conv1d_pallas(flat, basis,
                                 jnp.zeros((2 * n_freq,), jnp.float32),
                                 n_fft, hop, pad=0)
        spec = y[..., :n_freq] ** 2 + y[..., n_freq:] ** 2
        spec = spec.reshape(*lead, *spec.shape[1:])
    else:
        frames = frame_signal(x, n_fft, hop)  # (..., T, n_fft)
        real = jnp.matmul(frames, real_b, preferred_element_type=jnp.float32)
        imag = jnp.matmul(frames, imag_b, preferred_element_type=jnp.float32)
        spec = real * real + imag * imag
    if power != 2.0:
        spec = jnp.power(spec, power / 2.0)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freq, T)


def _axis_mask(key, x, mask_param: int, axis: int):
    """SpecAugment mask along `axis`: width ~ U[0, mask_param), start ~ U[0, size-width)."""
    size = x.shape[axis]
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (), minval=0.0, maxval=float(mask_param))
    start = jax.random.uniform(k2, (), minval=0.0, maxval=float(size) - width)
    idx = jnp.arange(size, dtype=jnp.float32)
    keep = (idx < start) | (idx >= start + width)
    shape = [1] * x.ndim
    shape[axis] = size
    return x * keep.reshape(shape).astype(x.dtype)


def freq_mask(key, spec, mask_param: int):
    """torchaudio.transforms.FrequencyMasking equivalent on (..., F, T)."""
    return _axis_mask(key, spec, mask_param, spec.ndim - 2)


def time_mask(key, spec, mask_param: int):
    """torchaudio.transforms.TimeMasking equivalent on (..., F, T)."""
    return _axis_mask(key, spec, mask_param, spec.ndim - 1)
