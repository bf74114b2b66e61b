"""Process-wide kernel-selection override for auto-mode Pallas sites.

Every kernel with a Pallas fast path defaults to "auto": Pallas on the TPU
backend, the XLA lowering elsewhere (ops/stft.py, ops/resample.py,
models/cnn1d.py stem, models/swin3d.py window attention).  `force_xla()`
temporarily pins every AUTO decision to the XLA path for code traced under
it — jax.export artifacts must not embed Mosaic `tpu_custom_call`s (they
are not a stable serialization target, and a cpu+tpu multi-platform export
could not lower them for cpu), so io/export.py traces the exported forward
under this override.  Explicitly-requested Pallas (e.g. `--pallas_stem on`)
is NOT overridden: the trace keeps the kernel and jax.export raises its
clear custom-call error instead of silently changing what was asked for.
"""

from contextlib import contextmanager

_FORCE_XLA = False


def pallas_auto() -> bool:
    """Should an auto-mode kernel take its Pallas path right now?"""
    import jax

    return (not _FORCE_XLA) and jax.default_backend() == "tpu"


@contextmanager
def force_xla():
    """Pin auto-mode kernel selection to XLA for the duration (tracing
    only — compiled functions keep whatever was chosen at trace time)."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev
