"""Windowed-sinc polyphase resampling as a strided matmul.

Replaces torchaudio.functional.resample (used by the reference's audio
datasets, reference datasets.py:288-291, 342-343) with the same algorithm —
gcd-reduced rates, Hann-windowed sinc lowpass, polyphase evaluation — laid out
TPU-first: the kernel bank is a (num_phases, width) matrix and resampling is
`frame + matmul`, so the whole op runs on the MXU with static shapes.

Defaults mirror torchaudio: lowpass_filter_width=6, rolloff=0.99,
sinc_interp_hann.
"""

import functools
import math

import jax.numpy as jnp
import numpy as np

from .framing import frame_signal


@functools.lru_cache(maxsize=16)
def resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                    rolloff: float = 0.99):
    """Polyphase kernel bank.

    Returns (kernels, width, orig_g, new_g) where kernels is a numpy array of
    shape (new_g, 2*width + orig_g) — one FIR per output phase — and the
    resampled signal is, per phase i and input block t:
        y[t*new_g + i] = sum_k kernels[i, k] * xpad[t*orig_g + k]
    with xpad = pad(x, (width, width + orig_g)).
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_g, new_g = int(orig_freq) // g, int(new_freq) // g
    base_freq = min(orig_g, new_g) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_g / base_freq))
    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = (-np.arange(new_g, dtype=np.float64)[:, None] / new_g + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t_pi = t * np.pi
    sinc = np.where(t == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernels = sinc * window * (base_freq / orig_g)
    return kernels.astype(np.float32), width, orig_g, new_g


def resample_poly_np(x, orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Host (numpy) variant for data-pipeline threads; same math as
    resample_poly without touching the JAX device."""
    if orig_freq == new_freq:
        return np.asarray(x)
    kernels, width, orig_g, new_g = resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    x = np.asarray(x, np.float32)
    length = x.shape[-1]
    target_len = -(-new_g * length // orig_g)
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(width, width + orig_g)]
    xpad = np.pad(x, pad_widths)
    frame_len = kernels.shape[1]
    num_frames = length // orig_g + 1
    idx = (np.arange(num_frames)[:, None] * orig_g
           + np.arange(frame_len)[None, :])
    frames = xpad[..., idx]
    y = frames @ kernels.T
    return y.reshape(*y.shape[:-2], -1)[..., :target_len]


def resample_poly(x, orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                  rolloff: float = 0.99, use_pallas: bool | None = None):
    """Resample x (..., L) from orig_freq to new_freq.

    Output length = ceil(new_freq * L / orig_freq), matching torchaudio.
    On TPU the polyphase frame+matmul runs through the fused Pallas kernel.
    """
    import jax

    if orig_freq == new_freq:
        return x
    kernels, width, orig_g, new_g = resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    length = x.shape[-1]
    target_len = -(-new_g * length // orig_g)  # ceil
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(width, width + orig_g)]
    xpad = jnp.pad(x, pad_widths)
    frame_len = kernels.shape[1]
    if use_pallas is None:
        from ..utils.kernels import pallas_auto

        use_pallas = pallas_auto()
    if use_pallas and xpad.ndim >= 2:
        from .pallas.framed_conv import framed_conv1d_pallas

        lead = xpad.shape[:-1]
        flat = xpad.reshape(-1, xpad.shape[-1])
        y = framed_conv1d_pallas(flat, jnp.asarray(kernels).T,
                                 jnp.zeros((new_g,), jnp.float32),
                                 frame_len, orig_g, pad=0)
        y = y.reshape(*lead, -1)
        return y[..., :target_len]
    frames = frame_signal(xpad, frame_len, orig_g)          # (..., T, frame_len)
    y = jnp.matmul(frames, jnp.asarray(kernels).T,
                   preferred_element_type=jnp.float32)       # (..., T, new_g)
    y = y.reshape(*y.shape[:-2], -1)                          # interleave phases
    return y[..., :target_len]
