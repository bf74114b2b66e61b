"""Inference/serving API: a compiled end-to-end predictor.

The reference had no serving story (training scripts only).  `Predictor`
wraps a trained multimodal model + checkpoint into a single compiled
function with fixed batch shape: variable-size request batches are padded to
the compiled size (one XLA program, no retraces) and scored in one device
round trip.  `MicroBatcher` sits in front of it for online serving:
concurrent single-clip requests are coalesced into one device dispatch
(batch-1 and batch-32 cost nearly the same on TPU — results_v5e.json p50
0.35 ms vs 41.9k clips/s), bounded by a max-delay deadline.
Throughput/latency on v5e: see benchmarks/results_v5e.json.
"""

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _check_batch_divides(batch_size: int, sharding):
    """The compiled batch must split evenly over the shard count of the
    LEADING axis of the sharding's spec (not the whole mesh — a dp x tp
    mesh shards the batch only along the axes named in spec[0])."""
    spec0 = sharding.spec[0] if len(sharding.spec) else None
    names = ((spec0,) if isinstance(spec0, str) else tuple(spec0 or ()))
    n_shards = 1
    for name in names:
        n_shards *= sharding.mesh.shape[name]
    if batch_size % n_shards:
        raise ValueError(
            f"batch_size {batch_size} must divide across the {n_shards} "
            f"batch shards of mesh axes {names}")


class ScorerBase:
    """Shared pad-and-score surface: fixed compiled batch shape, requests
    padded up to it, scores sliced back.  Implementations set `batch_size`,
    `variables`, and `self._forward(variables, batch) -> {head: logits}` —
    the live `Predictor` below and io/export.py's `ExportedPredictor`
    (which scores a serialized artifact with the weights baked in)."""

    batch_size: int
    variables = None

    def _pad_batch(self, modalities: Dict[str, np.ndarray], n: int):
        # with a mesh sharding, batch leaves are placed leading-axis-sharded
        # so the compiled forward runs data-parallel across the mesh
        sharding = getattr(self, "sharding", None)
        place = (jnp.asarray if sharding is None
                 else lambda x: jax.device_put(x, sharding))
        out = {}
        for name, data in modalities.items():
            data = np.asarray(data, np.float32)
            pad = self.batch_size - data.shape[0]
            if pad:
                data = np.pad(data, [(0, pad)] + [(0, 0)] * (data.ndim - 1))
            present = np.zeros((self.batch_size,), np.float32)
            present[:n] = 1.0
            out[name] = {"data": place(data), "present": place(present)}
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


class Predictor(ScorerBase):
    """Batched scorer for PhysVerb-style models.

    model: a module following the batch-dict protocol
           ({modality: {'data', 'present'}} -> {head: logits}).
    variables: trained variables ({'params', ...}); e.g. from
           io.checkpoint.restore_state or io.torch_import converters.
    batch_size: compiled batch size; requests are padded up to it.
    """

    def __init__(self, model, variables, batch_size: int = 32,
                 compute_dtype=None, quantize: str | None = None,
                 cache_dir: str | None = None, sharding=None,
                 param_placement=None):
        """`sharding`: optional leading-axis NamedSharding (e.g.
        parallel.mesh.data_sharding(mesh)) — the batch is sharded across
        the mesh and params are replicated, so one Predictor scores
        data-parallel across every chip of a slice (the serving-side
        counterpart of training DP; jit inserts the collectives).

        `param_placement`: optional params -> params hook applied after
        the mesh replication — tensor-parallel serving places the
        transformer kernels with parallel.sharding_rules.place_params so
        one scoring batch runs dp x tp across the slice."""
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
        elif quantize == "w8a8":
            # int8 weights AND dynamically-quantized int8 activations:
            # matmul kernels become bare int8 arrays (scales in the `quant`
            # collection) and TorchLinear/attention run int8 x int8 -> int32
            # on the MXU (2x bf16 MACs on v5e); conv kernels and everything
            # ineligible stay weight-only (utils/quantize.split_w8a8).
            from .utils.quantize import (dequantize_params, quantize_params,
                                         split_w8a8)

            p, qscales = split_w8a8(quantize_params(variables["params"]))
            variables = dict(variables, params=p, quant=qscales)
            dequant = dequantize_params
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.sharding = sharding
        if sharding is not None:
            _check_batch_divides(batch_size, sharding)
            from jax.sharding import NamedSharding, PartitionSpec

            # replicate params over the mesh: checkpoint-restored arrays are
            # committed to one device, which a sharded-batch jit rejects
            variables = jax.device_put(
                variables, NamedSharding(sharding.mesh, PartitionSpec()))
        if param_placement is not None:
            variables = dict(variables,
                             params=param_placement(variables["params"]))
        self.variables = variables

        def _make_forward():
            # a FRESH function object per call: jit's trace cache is keyed
            # on the function identity, so a forward traced under
            # utils.kernels.force_xla (io/export.py) can never reuse — or
            # poison — the live serving trace's Pallas kernel selection
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

            return _forward

        self._make_forward = _make_forward
        self._forward = _make_forward()

    def warmup(self, example_modalities: Dict[str, np.ndarray]):
        """Compile once with zero inputs shaped like a real request."""
        batch = self._pad_batch(example_modalities, 1)
        out = self._forward(self.variables, batch)
        jax.block_until_ready(out)
        self.heads = sorted(out)  # head names, free byproduct of the warmup
        self.modalities = sorted(example_modalities)  # served modality set
        return self


class MicroBatcher:
    """Dynamic micro-batching front-end for `Predictor`.

    Concurrent callers `submit()` small request batches (usually one clip)
    and get a Future; a background batcher coalesces whatever is pending —
    up to the predictor's compiled batch size, waiting at most
    `max_delay_ms` after the first request — into ONE padded device
    dispatch, then splits the scores back per caller.  On TPU a batch-1
    and a full-batch forward cost nearly the same, so under concurrent
    load this approaches full-batch throughput at ~max_delay_ms added p50.

    All requests must carry the predictor's fixed modality set (one
    compiled presence pattern — the same invariant AggrBatchSampler
    guarantees in training); a mismatched or oversized request fails only
    its own Future, and a request whose modalities disagree on batch size
    is rejected at submit() before it can misalign the merged group.
    """

    def __init__(self, predictor: ScorerBase, max_delay_ms: float = 2.0,
                 return_probs: bool = True):
        self.predictor = predictor
        self.max_delay = max_delay_ms / 1e3
        self.return_probs = return_probs
        # observability counters, written only by the batcher thread
        # (reads from other threads see a consistent-enough snapshot):
        # dispatches = device round trips, clips = real rows scored —
        # clips/dispatches is the achieved coalescing factor
        self.stats = {"dispatches": 0, "clips": 0, "failed_requests": 0}
        self._queue: queue.Queue = queue.Queue()
        self._holdover = None  # request that didn't fit the last group
        self._closed = False
        # guards the closed-check+enqueue pair: without it a submit racing
        # close() could enqueue after the drain loop exited, leaving its
        # Future unresolved forever
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="microbatcher")
        self._thread.start()

    def submit(self, modalities: Dict[str, np.ndarray]) -> Future:
        """modalities: {name: (n, ...)} with 1 <= n <= batch_size.
        Returns a Future resolving to {head: (n, classes)}."""
        fut: Future = Future()
        sizes = {name: np.asarray(v).shape[0] for name, v in modalities.items()}
        if not sizes:
            raise ValueError("empty request: no modalities")
        n = next(iter(sizes.values()))
        if any(s != n for s in sizes.values()):
            # reject before enqueue: a request whose modalities disagree on
            # batch size would misalign the merged group's per-caller
            # offsets and return wrong rows to OTHER callers
            raise ValueError(f"modalities disagree on batch size: {sizes}")
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.put((modalities, int(n), fut))
        return fut

    def close(self):
        """Drain pending requests, then stop the batcher thread."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # ordered after every accepted submit
        self._thread.join()

    # ------------------------------------------------------------- internals
    def _next_group(self):
        """Block for the first request, then gather until the compiled batch
        is full or max_delay has elapsed.  Returns (group, stop)."""
        cap = self.predictor.batch_size
        first = self._holdover or self._queue.get()
        self._holdover = None
        if first is None:
            return [], True
        group, total = [first], first[1]
        stop = False
        deadline = time.monotonic() + self.max_delay
        while total < cap:
            try:
                item = self._queue.get(
                    timeout=max(deadline - time.monotonic(), 0.0))
            except queue.Empty:
                break
            if item is None:
                stop = True
                break
            if total + item[1] > cap:
                self._holdover = item
                break
            group.append(item)
            total += item[1]
        return group, stop

    def _run(self):
        while True:
            group, stop = self._next_group()
            if group:
                self._score(group)
            if stop:
                # drain anything enqueued between the sentinel and close()
                while self._holdover is not None or not self._queue.empty():
                    group, _ = self._next_group()
                    if group:
                        self._score(group)
                return

    def _score(self, group):
        try:
            # validate against the SERVED modality set (recorded by
            # Predictor.warmup) so one malformed request fails only its own
            # Future; anchor on the group head only for un-warmed predictors
            want = set(getattr(self.predictor, "modalities", None)
                       or next(iter(group))[0])
            ok = []
            for modalities, n, fut in group:
                if not fut.set_running_or_notify_cancel():
                    continue  # caller cancelled while queued
                if set(modalities) != want:
                    self.stats["failed_requests"] += 1
                    fut.set_exception(ValueError(
                        f"modalities {sorted(modalities)} != batcher group "
                        f"{sorted(want)} (one compiled presence pattern)"))
                else:
                    ok.append((modalities, n, fut))
            if not ok:
                return
            merged = {name: np.concatenate(
                [np.asarray(m[name], np.float32) for m, _, _ in ok])
                for name in want}
            scores = self.predictor.predict(merged,
                                            return_probs=self.return_probs)
            self.stats["dispatches"] += 1
            self.stats["clips"] += sum(n for _, n, _ in ok)
            offset = 0
            for _, n, fut in ok:
                fut.set_result({h: s[offset:offset + n]
                                for h, s in scores.items()})
                offset += n
        except Exception as e:  # scoring failed: fail every waiter, not the thread
            failed = 0
            for _, _, fut in group:
                if not fut.done():
                    fut.set_exception(e)
                    failed += 1
            self.stats["failed_requests"] += failed
