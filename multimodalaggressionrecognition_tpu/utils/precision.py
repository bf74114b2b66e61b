"""Mixed-precision helpers (bf16 compute, f32 master params).

TPU-native training keeps the optimizer state and master parameters in
float32 and casts parameters + activations to bfloat16 at the step boundary;
every matmul/conv still accumulates in float32 on the MXU
(`preferred_element_type` / hardware accumulation), and normalization
statistics are computed in float32 inside the layer implementations
(models/nn1d.py BatchNorm1d, models/layers.py TorchLayerNorm).  The
reference is float32-only (no AMP anywhere in /root/reference); this is a
new capability of the rebuild, exposed via `compute_dtype='bfloat16'` on
train/eval steps (train/steps.py) and the serving Predictor (serve.py).
"""

import jax
import jax.numpy as jnp

_DTYPES = {
    None: None,
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def resolve_dtype(spec):
    """'bf16'/'bfloat16'/'f32'/'float32'/None or a dtype -> jnp dtype or None."""
    if isinstance(spec, str):
        try:
            return _DTYPES[spec.lower()]
        except KeyError:
            raise ValueError(f"unknown compute dtype {spec!r}") from None
    if spec in _DTYPES:
        return _DTYPES[spec]
    return jnp.dtype(spec)


def cast_floating(tree, dtype):
    """Cast floating-point leaves of a pytree to `dtype`; leave ints/bools.

    No-op when dtype is None or float32-to-float32.
    """
    dtype = resolve_dtype(dtype)
    if dtype is None:
        return tree

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != dtype:
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
