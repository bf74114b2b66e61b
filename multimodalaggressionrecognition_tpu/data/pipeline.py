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


def device_prefetch(batch_iter: Iterable, prefetch: int = 2,
                    sharding=None, upload_threads: int = 2) -> Iterator:
    """Iterate `batch_iter`, uploading each pytree to device ahead of time.

    Uploads run on a small thread pool (`upload_threads`) with up to
    `prefetch` batches in flight, order preserved — overlapping host->device
    transfer latency with both batch construction and device compute.
    `sharding` (e.g. NamedSharding over a data-parallel mesh) is applied to
    every array leaf when given."""
    from concurrent.futures import ThreadPoolExecutor

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(batch_iter)
    with ThreadPoolExecutor(max_workers=max(upload_threads, 1)) as pool:
        pending = []
        exhausted = False
        while True:
            while not exhausted and len(pending) <= prefetch:
                try:
                    batch = next(it)
                except StopIteration:
                    exhausted = True
                    break
                pending.append(pool.submit(put, batch))
            if not pending:
                return
            yield pending.pop(0).result()


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

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        batches = list(self.sampler)
        if self.num_threads <= 1:
            for idx in batches:
                b = self.source.build_batch(idx, pad_to=self.pad_to)
                if b is not None:  # all-EMPTY batch: nothing to train on
                    yield b
            return
        with ThreadPoolExecutor(self.num_threads) as pool:
            futures = [pool.submit(self.source.build_batch, idx, self.pad_to)
                       for idx in batches]
            for f in futures:
                b = f.result()
                if b is not None:
                    yield b
