"""Preemption handling: catch SIGTERM, checkpoint mid-epoch, exit cleanly.

TPU pods are routinely preempted (maintenance events, spot reclaim) with a
short grace window — too short to finish an epoch.  The reference's only
recovery story was restarting at the last completed epoch
(reference trainer.py:67-68, 400-402).  Here a `PreemptionGuard` turns the
signal into a cooperative flag the Trainer polls once per train step; on
preemption the Trainer writes a PARTIAL checkpoint (TrainState + epoch +
batches_done + metric accumulators) and exits 0, and a resumed run replays
the epoch's remaining batches with identical RNG streams and batch order,
reproducing the uninterrupted run's logs exactly
(tests/test_preemption.py).
"""

import signal
import threading


class PreemptionGuard:
    """Cooperative stop flag set by SIGTERM (and any extra signals).

    Use as a context manager around the training loop; `should_stop()` is
    polled at step boundaries.  In multi-process runs the local flag is
    promoted to a global consensus (max over processes) so every process
    agrees on the SAME stopping step — the preemption checkpoint save is a
    collective and divergent stop points would deadlock it.  The consensus
    allgather blocks the host loop, so it runs only every
    `consensus_interval` polls (identical across processes — polls happen
    in SPMD lockstep); between consensus points should_stop returns the
    LAST consensus, never the local flag, which would diverge.  Worst-case
    extra steps after the signal: consensus_interval - 1.

    Works when entered off the main thread too (signal.signal is
    main-thread-only): the handler install is skipped and the guard
    degrades to a manually `request()`-able flag.
    """

    def __init__(self, signals=(signal.SIGTERM,), verbose: bool = True,
                 consensus_interval: int = 8):
        self.signals = tuple(signals)
        self.verbose = verbose
        self.consensus_interval = max(int(consensus_interval), 1)
        self._flag = threading.Event()
        self._previous = {}
        self._polls = 0
        self._consensus = False

    # ------------------------------------------------------------- lifecycle
    def __enter__(self):
        for sig in self.signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not the main thread: manual request() only
                pass
        return self

    def __exit__(self, *exc):
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        return False

    # ------------------------------------------------------------- flag
    def _handler(self, signum, frame):
        if self.verbose and not self._flag.is_set():
            print(f"[preemption] caught signal {signum}; will checkpoint at "
                  "the next step boundary", flush=True)
        self._flag.set()

    def request(self):
        """Programmatic preemption (tests, external schedulers)."""
        self._flag.set()

    @property
    def requested(self) -> bool:
        return self._flag.is_set()

    def should_stop(self) -> bool:
        """Local flag, promoted to a cross-process consensus when needed."""
        import jax

        if jax.process_count() == 1:
            return self._flag.is_set()
        if self._consensus:
            return True
        self._polls += 1
        if self._polls % self.consensus_interval:
            return False
        from jax.experimental import multihost_utils
        import numpy as np

        flags = multihost_utils.process_allgather(
            np.float32(1.0 if self._flag.is_set() else 0.0))
        self._consensus = bool(np.max(flags) > 0.0)
        return self._consensus
