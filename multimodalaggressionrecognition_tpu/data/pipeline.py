"""Host -> device input pipeline with background prefetch.

The reference did all decode/augment work inline in `__getitem__` on the
training process with num_workers=0 (reference train_multimodal.py:257-268,
datasets.py:504-506), serializing data prep with GPU compute.  Here batches
are built on host threads and uploaded ahead of time so TPU steps never wait
on input: a bounded queue holds `prefetch` device-resident batches
(double-buffering by default).
"""

from typing import Iterable, Iterator, Optional

import jax


def _ordered_window(pool, jobs: Iterable, window: int) -> Iterator:
    """Submit `jobs` ((fn, *args) tuples) to `pool` with at most `window`
    in flight, yielding results in submission order.  The single bounded
    producer/consumer loop behind both device_prefetch and BatchLoader —
    an unbounded submit would let workers run arbitrarily far ahead of
    consumption and hold every result in memory at once."""
    pending = []
    it = iter(jobs)
    exhausted = False
    while True:
        while not exhausted and len(pending) < window:
            try:
                job = next(it)
            except StopIteration:
                exhausted = True
                break
            pending.append(pool.submit(*job))
        if not pending:
            return
        yield pending.pop(0).result()


def device_prefetch(batch_iter: Iterable, prefetch: int = 2,
                    sharding=None, upload_threads: int = 2) -> Iterator:
    """Iterate `batch_iter`, uploading each pytree to device ahead of time.

    Uploads run on a small thread pool (`upload_threads`) with up to
    `prefetch` batches in flight, order preserved — overlapping host->device
    transfer latency with both batch construction and device compute.
    `sharding` (e.g. NamedSharding over a data-parallel mesh) is applied to
    every array leaf when given."""
    from concurrent.futures import ThreadPoolExecutor

    multiproc = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multiproc:
                # Each process holds only its slice of the global batch
                # (ProcessLocalBatches); assemble the logical global array
                # from per-host shards — a plain device_put of host-local
                # numpy cannot produce a multi-process global array.
                import numpy as np

                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)), batch)
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    with ThreadPoolExecutor(max_workers=max(upload_threads, 1)) as pool:
        yield from _ordered_window(
            pool, ((put, batch) for batch in batch_iter), prefetch + 1)


class ProcessLocalBatches:
    """Per-host slice of a global batch stream for multi-process DP.

    Every process iterates the SAME deterministic global batch sequence
    (same sampler seed everywhere — AggrBatchSampler is seed-deterministic,
    tests/test_trainer_internals.py) and keeps the contiguous slice of each
    batch's leading axis that its local devices own.  `device_prefetch`
    then reassembles the logical global array via
    `jax.make_array_from_process_local_data`, so one global train step
    consumes one global batch laid out exactly as in single-process runs.

    Host-sharding strategy: slicing the BATCH (not the dataset) preserves
    the reference AggrBatchSampler semantics globally — label-homogeneous
    batches stay homogeneous per host, and epoch order is identical to the
    single-process run.
    """

    def __init__(self, batches, process_id=None, num_processes=None):
        self.batches = batches
        self.process_id = (jax.process_index() if process_id is None
                           else process_id)
        self.num_processes = (jax.process_count() if num_processes is None
                              else num_processes)

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for batch in self.batches:
            n = _leading_dim(batch)
            per, rem = divmod(n, self.num_processes)
            if rem:
                raise ValueError(
                    f"global batch size {n} must divide evenly across "
                    f"{self.num_processes} processes")
            lo = self.process_id * per
            yield jax.tree.map(lambda x: x[lo:lo + per], batch)


def _leading_dim(batch):
    leaf = jax.tree.leaves(batch)[0]
    return leaf.shape[0]


class BatchLoader:
    """Sampler + source -> iterator of fixed-shape numpy batches.

    Uses a thread pool to build batches concurrently (the C++ host decode
    service in native/ plugs in underneath MultimodalSource for mp4/wav
    decode; for .npy/.pt artifacts numpy/torch-cpu are already efficient).
    """

    def __init__(self, source, sampler, pad_to: Optional[int] = None,
                 num_threads: int = 4):
        self.source = source
        self.sampler = sampler
        self.pad_to = pad_to
        self.num_threads = num_threads

    def __len__(self):
        return len(self.sampler)

    def iter_skipping(self, skip: int):
        """Iterate like __iter__ but consume the first `skip` YIELDED
        batches without building them.  Used by mid-epoch resume
        (train/loop.py): the already-trained prefix only needs the stream
        position advanced, not the batches decoded.  All-EMPTY batches
        (build_batch -> None) are never yielded, so they must not count
        toward `skip` — `source.batch_is_empty(indices)` answers that from
        the table alone when available; sources without it (which also
        never return None) count every sampler batch."""
        batches = iter(list(self.sampler))
        is_empty = getattr(self.source, "batch_is_empty", None)
        skipped = 0
        while skipped < skip:
            try:
                idx = next(batches)
            except StopIteration:
                raise ValueError(
                    f"cannot skip {skip} batches: the loader only yields "
                    f"{skipped} — resume state does not match this dataset")
            if is_empty is None or not is_empty(idx):
                skipped += 1
        yield from self._iter_indices(batches)

    def __iter__(self):
        return self._iter_indices(list(self.sampler))

    def _iter_indices(self, batches):
        from concurrent.futures import ThreadPoolExecutor

        if self.num_threads <= 1:
            for idx in batches:
                b = self.source.build_batch(idx, pad_to=self.pad_to)
                if b is not None:  # all-EMPTY batch: nothing to train on
                    yield b
            return
        with ThreadPoolExecutor(self.num_threads) as pool:
            jobs = ((self.source.build_batch, idx, self.pad_to)
                    for idx in batches)
            for b in _ordered_window(pool, jobs, 2 * self.num_threads):
                if b is not None:  # all-EMPTY batch: nothing to train on
                    yield b
