"""Profiling / tracing hooks (new subsystem; the reference had none —
SURVEY.md §5.1: only a notebook time.time() microbenchmark).

- `trace(dir)`: context manager around jax.profiler.trace for step-level
  XLA traces viewable in TensorBoard/Perfetto.
- `StepTimer`: lightweight per-step wall-clock aggregation the Trainer can
  print alongside epoch metrics.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {name: self.totals[name] / max(self.counts[name], 1)
                for name in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()
