"""PyTorch-compatible parameter initializers.

The reference models (reference models.py) rely on torch's default inits
(kaiming-uniform with a=sqrt(5) for Linear/Conv weights, fan-in uniform for
biases).  Training dynamics — and therefore reproduced accuracy — depend on
matching these distributions, so the Flax modules in this framework default to
them instead of flax's lecun_normal.
"""

import math

import jax
import jax.numpy as jnp


def uniform_fan_in(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Linear/Conv bias init."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_init(fan_in: int):
    """torch kaiming_uniform_(a=sqrt(5)) on a (fan_in, fan_out) kernel.

    gain = sqrt(2/(1+a^2)) = sqrt(1/3); bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).
    """
    return uniform_fan_in(fan_in)


def torch_conv_init(fan_in: int):
    """Same bound as torch_linear_init; fan_in = in_channels * prod(kernel)."""
    return uniform_fan_in(fan_in)
