"""Optional TensorBoard scalar sink for training metrics.

The reference-parity observability artifacts are the per-head CSV logs and
PNG curve plots (train/loop.py, mirroring reference trainer.py:340-345,
485-546).  This adds LIVE per-epoch scalars — `<head>/<split>/<metric>` —
when `--tensorboard_dir` is set, composing with `--profile_dir`'s xplane
traces (one TensorBoard instance shows training curves and the profiler).

tensorflow is only imported when a writer is actually constructed; if it
is unavailable the writer degrades to a no-op with a single warning, so
the training path never hard-depends on TF.
"""

import numpy as np


class TBWriter:
    """Per-epoch scalar writer; no-op when tensorflow is unavailable."""

    def __init__(self, logdir: str):
        self._writer = None
        try:
            import tensorflow as tf  # heavyweight: imported only on demand
        except ImportError:
            print(f"[tblog] tensorflow not available; TensorBoard scalars "
                  f"to {logdir!r} disabled (CSV/PNG logs unaffected)",
                  flush=True)
            return
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def log(self, split: str, epoch: int, results: dict):
        """results: {head: {metric: value}} — scalars only (the per-class
        precision/recall/f1 arrays stay in the CSVs)."""
        if self._writer is None:
            return
        with self._writer.as_default():
            for head, metrics in results.items():
                for name, value in metrics.items():
                    if isinstance(value, (int, float, np.floating,
                                          np.integer)):
                        self._tf.summary.scalar(f"{head}/{split}/{name}",
                                                float(value), step=epoch)
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None
