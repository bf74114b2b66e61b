"""2-D / 3-D convolution primitives, channels-last, torch semantics.

Video tensors are (B, T, H, W, C) and images (B, H, W, C); convolutions use
XLA's conv_general_dilated which the TPU backend lowers onto the MXU.
`BatchNorm` here normalizes over all non-channel axes, which reproduces
torch BatchNorm2d/3d on the channels-last layout (same math as
nn1d.BatchNorm1d, reused).
"""

import math
from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.torch_compat import uniform_fan_in
from .nn1d import BatchNorm1d as BatchNorm  # rank-agnostic (all-but-last axes)


def _tuple(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class ConvNd(nn.Module):
    """N-dim conv on channels-last input; kernel (*K, C_in, C_out) = torch
    weight (C_out, C_in, *K) transposed — see io/torch_import.conv3d."""

    features: int
    kernel_size: Union[int, Tuple[int, ...]]
    ndim: int = 3
    stride: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        n = self.ndim
        k = _tuple(self.kernel_size, n)
        s = _tuple(self.stride, n)
        p = _tuple(self.padding, n)
        c_in = x.shape[-1]
        fan_in = c_in * math.prod(k)
        kernel = self.param("kernel", uniform_fan_in(fan_in),
                            (*k, c_in, self.features))
        spatial = "DHW"[-n:]
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        # No preferred_element_type=f32: the conv TRANSPOSE rule would feed
        # the f32-promoted cotangent back into a conv against bf16 operands
        # and trip lax's same-dtype check (breaking bf16 fine-tuning); MXU
        # convs accumulate in f32 internally either way (same fix as
        # nn1d.Conv1d).
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=s,
            padding=[(pi, pi) for pi in p], dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", uniform_fan_in(fan_in), (self.features,))
            y = y + bias
        return y.astype(x.dtype)


class Conv3d(ConvNd):
    ndim: int = 3


class Conv2d(ConvNd):
    ndim: int = 2


def max_pool_nd(x, window, stride=None, padding=0):
    """torch MaxPoolNd on channels-last input (VALID => floor semantics)."""
    n = x.ndim - 2
    w = _tuple(window, n)
    s = _tuple(stride if stride is not None else window, n)
    p = _tuple(padding, n)
    dims = (1, *w, 1)
    strides = (1, *s, 1)
    pads = ((0, 0), *[(pi, pi) for pi in p], (0, 0))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, pads)


def global_avg_pool(x):
    """AdaptiveAvgPool(1) + Flatten on channels-last input."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes)
