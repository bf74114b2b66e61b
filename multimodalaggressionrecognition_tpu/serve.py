"""Inference/serving API: a compiled end-to-end predictor.

The reference had no serving story (training scripts only).  `Predictor`
wraps a trained multimodal model + checkpoint into a single compiled
function with fixed batch shape: variable-size request batches are padded to
the compiled size (one XLA program, no retraces) and scored in one device
round trip.  Throughput/latency on v5e: see benchmarks/results_v5e.json
(p50 single-clip latency ~2.3 ms end-to-end).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Batched scorer for PhysVerb-style models.

    model: a module following the batch-dict protocol
           ({modality: {'data', 'present'}} -> {head: logits}).
    variables: trained variables ({'params', ...}); e.g. from
           io.checkpoint.restore_state or io.torch_import converters.
    batch_size: compiled batch size; requests are padded up to it.
    """

    def __init__(self, model, variables, batch_size: int = 32,
                 compute_dtype=None, quantize: str | None = None,
                 cache_dir: str | None = None):
        from .utils.precision import cast_floating, resolve_dtype

        if cache_dir:
            # serving restarts skip the minutes-long first compile
            from .utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(cache_dir)

        self.model = model
        self.batch_size = batch_size
        dtype = resolve_dtype(compute_dtype)

        dequant = None
        if quantize == "int8":
            # Weight-only int8: kernels live in HBM as int8 + per-channel
            # scales (4x smaller) and are dequantized on device inside the
            # compiled program (utils/quantize.py).
            from .utils.quantize import dequantize_params, quantize_params

            variables = dict(variables,
                             params=quantize_params(variables["params"]))
            dequant = dequantize_params
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.variables = variables

        @jax.jit
        def _forward(variables, modalities):
            params = variables["params"]
            if dequant is not None:
                params = dequant(params, dtype or jnp.float32)
            if dtype is not None:
                params = cast_floating(params, dtype)
                modalities = cast_floating(modalities, dtype)
            out = model.apply(dict(variables, params=params), modalities)
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        self._forward = _forward

    def warmup(self, example_modalities: Dict[str, np.ndarray]):
        """Compile once with zero inputs shaped like a real request."""
        batch = self._pad_batch(example_modalities, 1)
        jax.block_until_ready(self._forward(self.variables, batch))
        return self

    def _pad_batch(self, modalities: Dict[str, np.ndarray], n: int):
        out = {}
        for name, data in modalities.items():
            data = np.asarray(data, np.float32)
            pad = self.batch_size - data.shape[0]
            if pad:
                data = np.pad(data, [(0, pad)] + [(0, 0)] * (data.ndim - 1))
            present = np.zeros((self.batch_size,), np.float32)
            present[:n] = 1.0
            out[name] = {"data": jnp.asarray(data),
                         "present": jnp.asarray(present)}
        return out

    def predict(self, modalities: Dict[str, np.ndarray],
                return_probs: bool = True):
        """modalities: {name: (n, ...)} with n <= batch_size.

        Returns {head: (n, classes)} probabilities (or logits)."""
        n = next(iter(modalities.values())).shape[0]
        if n > self.batch_size:
            raise ValueError(f"request batch {n} > compiled {self.batch_size}")
        batch = self._pad_batch(modalities, n)
        logits = self._forward(self.variables, batch)
        out = {}
        for head, lg in logits.items():
            lg = np.asarray(lg[:n])
            out[head] = (np.asarray(jax.nn.softmax(lg, axis=-1))
                         if return_probs else lg)
        return out
