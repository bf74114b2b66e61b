"""1-D conv-net building blocks with torch semantics, channels-last layout.

All sequence tensors are (B, L, C): C rides the TPU lane dimension and the
strided convolutions lower to frame+matmul on the MXU (ops/framing.py).
The reference's (B, C, L) layout is converted at the weight-import boundary.

BatchNorm matches torch.nn.BatchNorm1d: eps=1e-5, momentum=0.1 (torch
convention: running = (1-m)*running + m*batch), normalization with the biased
batch variance but running-var updated with the unbiased one.  Running stats
live in the `batch_stats` collection.

Dropout1d drops whole channels: noise shape (B, 1, C).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.framing import framed_matmul
from ..utils.torch_compat import uniform_fan_in


class Conv1d(nn.Module):
    """Strided 1-D convolution on (B, L, C_in) -> (B, L_out, C_out).

    Kernel stored as (K * C_in, C_out), frame-major — torch Conv1d weight
    (C_out, C_in, K) converts via w.transpose(2, 1, 0).reshape(K*C_in, C_out).

    Lowering (measured on v5e, benchmarks/proto_conv1d round 3):
      - C_in below `frame_below` (waveform stems): frame+matmul — the
        native conv is lane-starved at C_in=1 (3/128 lanes), framing packs
        K taps into the contraction dim; `use_pallas` further fuses the
        framing into a Pallas kernel (~2x the XLA framed matmul).
      - C_in >= `frame_below`: XLA's native conv (NWC/WIO) — the framed
        path materializes a K*C_in-wide frame tensor through a gather
        (2.1 GB for the wav2vec conv2 layer, 15+ ms vs 4.6 ms native).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    use_pallas: bool = False
    frame_below: int = 16  # frame+matmul lowering for C_in < this

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        fan_in = c_in * self.kernel_size
        kernel = self.param("kernel", uniform_fan_in(fan_in),
                            (self.kernel_size * c_in, self.features))
        if kernel.dtype == jnp.int8:
            # w8a8 serving (utils/quantize.split_w8a8) stores conv kernels
            # as int8 + per-out-channel scale too; convs dequantize inline
            # (weight-only — int8 conv lowering is not worth the accuracy
            # risk at these small channel counts).
            wscale = self.get_variable("quant", "kernel_scale")
            kernel = kernel.astype(jnp.float32) * wscale
        bias = (self.param("bias", uniform_fan_in(fan_in), (self.features,))
                if self.use_bias else None)
        if self.use_pallas and c_in == 1 and bias is not None:
            from ..ops.pallas.framed_conv import framed_conv1d

            # The fused kernel runs in f32 (the framing/gather side is
            # bandwidth-shaped for f32 tiles and f32 matmuls already execute
            # as bf16 MXU passes at default precision, so there is nothing
            # to gain from a bf16 kernel); under mixed precision cast in/out.
            y = framed_conv1d(x[..., 0].astype(jnp.float32),
                              kernel.astype(jnp.float32),
                              bias.astype(jnp.float32),
                              self.kernel_size, self.stride, self.padding)
            return y.astype(x.dtype)
        if c_in >= self.frame_below:
            # lane-dense input: native conv, no frame materialization.
            # (K*C_in, C_out) frame-major == (K, C_in, C_out) WIO.
            # No preferred_element_type: the conv TRANSPOSE rule feeds the
            # f32-promoted cotangent back into a conv against bf16 operands
            # and trips the same-dtype check; MXU convs accumulate in f32
            # internally either way.
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype).reshape(
                    self.kernel_size, c_in, self.features),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            if bias is not None:
                y = y + bias
            return y.astype(x.dtype)
        # f32 MXU accumulation; output back in the activation dtype so a
        # bf16 trunk stays bf16 end to end.
        return framed_matmul(x, kernel.astype(x.dtype), bias,
                             self.kernel_size, self.stride,
                             pad=self.padding).astype(x.dtype)


class BatchNorm1d(nn.Module):
    momentum: float = 0.1  # torch convention
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            n = x.size // c
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean) * inv + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def max_pool1d(x, window: int, stride: Optional[int] = None):
    """torch MaxPool1d on (B, L, C): valid padding => floor(L/stride)."""
    stride = stride or window
    return nn.max_pool(x, (window,), strides=(stride,), padding="VALID")


class Dropout1d(nn.Module):
    """Channel dropout on (B, L, C): zeroes whole channels per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


class SampleDropout(nn.Module):
    """Drops entire rows of a (B, F) tensor.

    Parity shim for the reference classifier's `nn.Dropout1d(0.2)` applied
    *after* Flatten (reference models.py:996): torch treats the (B, F) input
    as an unbatched (C, L) tensor and zeroes whole rows, i.e. whole samples.
    Identity in eval mode.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1))
        return jnp.where(mask, x / keep, 0.0)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm on (B, L, C) (normalizes over L and channel group)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, length, c = x.shape
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, length, g, c // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y.reshape(b, length, c) * scale + bias).astype(x.dtype)
