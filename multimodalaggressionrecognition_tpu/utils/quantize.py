"""Post-training int8 weight quantization for serving.

TPU-native serving lever the reference (training-only scripts) never had:
matmul/conv kernels are stored as int8 with per-output-channel symmetric
scales and dequantized on device at use — a 4x cut in weight HBM footprint
and read traffic, which is what bounds low-batch serving latency.  Accuracy
is parity-tested (tests/test_quantize.py): per-channel symmetric int8 keeps
flagship logits within tolerance and argmax decisions unchanged.

Layout convention: channels-last everywhere (CLAUDE.md), so the LAST axis of
every >=2-D kernel is the output-channel axis and scales are per-last-axis.
1-D params (biases, BN scale/shift, LayerNorm) stay f32 — they are tiny and
precision-critical.
"""

from typing import Any

import jax.numpy as jnp
import numpy as np

_MARKER = "__qint8__"


def _is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and _MARKER in node


def _quantize_array(w):
    axes = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {_MARKER: True, "q": q, "scale": scale.astype(jnp.float32)}


# Parameter names that look like kernels by shape but are lookup tables /
# additive biases, not matmul weights — quantizing them buys no matmul-read
# bandwidth and costs accuracy (e.g. Swin's relative_position_bias_table,
# ~2500 x heads, is added directly to attention scores).
_SKIP_NAMES = ("bias_table", "embedding", "pos_embed")


def quantize_params(params: Any, min_size: int = 1024) -> Any:
    """Quantize every float kernel with ndim>=2 and size>=min_size to int8.

    Returns a tree of the same structure where quantized leaves are replaced
    by {'__qint8__': True, 'q': int8, 'scale': f32 per-out-channel}.
    Name-matched lookup/bias tables (`_SKIP_NAMES`) stay float.
    """
    if isinstance(params, dict):
        return {k: (v if any(s in k for s in _SKIP_NAMES)
                    else quantize_params(v, min_size))
                for k, v in params.items()}
    w = params
    if (hasattr(w, "ndim") and w.ndim >= 2 and w.size >= min_size
            and jnp.issubdtype(jnp.asarray(w).dtype, jnp.floating)):
        return _quantize_array(jnp.asarray(w))
    return w


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Reconstruct a dense float tree (jit-friendly: runs on device)."""
    if _is_quantized_leaf(params):
        return params["q"].astype(dtype) * params["scale"].astype(dtype)
    if isinstance(params, dict):
        return {k: dequantize_params(v, dtype) for k, v in params.items()}
    return params


def tree_nbytes(params: Any) -> int:
    """Total buffer bytes of a (possibly quantized) tree."""
    total = 0
    stack = [params]
    while stack:
        node = stack.pop()
        if isinstance(node, dict):
            if _is_quantized_leaf(node):
                total += node["q"].size + node["scale"].size * 4
            else:
                stack.extend(node.values())
        elif hasattr(node, "size"):
            total += int(node.size) * np.dtype(node.dtype).itemsize
    return total
