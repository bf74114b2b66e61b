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

import jax
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
        # the skip-name match applies to array LEAVES only: a module whose
        # name happens to contain e.g. 'embedding' must still have its
        # subtree recursed, or its matmul kernels would silently stay float
        return {k: (v if any(s in k for s in _SKIP_NAMES)
                    and not isinstance(v, dict)
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


# ---------------------------------------------------------------------------
# w8a8: int8 weights AND dynamically-quantized int8 activations, so matmuls
# run as int8 x int8 -> int32 on the MXU (2x the bf16 MACs on v5e) instead of
# dequantize-then-float.  The split below turns matmul kernels consumed by
# quant-aware modules (models/layers.py TorchLinear / MultiheadSelfAttention,
# models/nn1d.py Conv1d) into bare int8 arrays in `params` plus per-output-
# channel scales in a parallel `quant` collection the modules read back via
# `self.get_variable`.  Everything else keeps the weight-only marker-dict
# format and is dequantized by `dequantize_params` as before.

# Leaf names that are 2-D matmul kernels consumed by quant-aware modules.
# (All other ndim==2 params are RNN gate kernels — kernel_ih/kernel_hh —
# which stay weight-only: they sit inside a lax.scan where per-step dynamic
# quantization would dominate.)
_W8A8_KERNEL_NAMES = ("kernel", "in_proj_kernel", "out_proj_kernel")


def split_w8a8(qparams: Any):
    """Split a `quantize_params` tree into (params, quant) for w8a8 serving.

    Eligible leaves (quantized dicts named in `_W8A8_KERNEL_NAMES` with a
    2-D q) become the int8 array itself in `params`, with their f32
    per-output-channel scale stored as `<name>_scale` at the same module
    path in the returned `quant` tree.  Ineligible quantized leaves keep the
    marker-dict form (weight-only; `dequantize_params` handles them).
    """
    if not isinstance(qparams, dict) or _is_quantized_leaf(qparams):
        return qparams, {}
    params, quant = {}, {}
    for k, v in qparams.items():
        if (_is_quantized_leaf(v) and k in _W8A8_KERNEL_NAMES
                and v["q"].ndim == 2):
            params[k] = v["q"]
            quant[k + "_scale"] = v["scale"].reshape(-1)
        else:
            sub_p, sub_q = split_w8a8(v)
            params[k] = sub_p
            if sub_q:
                quant[k] = sub_q
    return params, quant


def int8_matmul(x, qkernel, wscale, out_dtype=None):
    """y = x @ dequant(qkernel) computed as int8 x int8 -> int32 on the MXU.

    Activations are quantized per row (symmetric abs-max over the last axis,
    recomputed per call — "dynamic" quantization, no calibration data), the
    dot accumulates in int32, and the result is rescaled by
    (row_scale x per-out-channel wscale).  x may have any leading shape;
    contraction is over the last axis.
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    xscale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xscale = jnp.maximum(xscale, 1e-12)
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qkernel,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xscale * wscale.astype(jnp.float32)
    return y.astype(out_dtype)


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
