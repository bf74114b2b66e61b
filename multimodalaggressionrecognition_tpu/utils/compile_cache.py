"""Persistent XLA compilation cache for fast serving/training restarts.

First compile of the flagship program costs minutes on a fresh process
(remote-compiled Pallas kernels dominate); a process restart should not pay
it again.  This wires jax's persistent compilation cache to a directory so
recompiles of byte-identical programs are disk hits.  The reference had no
serving story at all; for production serving, cold-start latency is part of
the SLO.
"""

import os

# Conventional cache location shared by bench.py, benchmarks/bench_all.py,
# and cli.doctor's report; CLIs take any dir via --compilation_cache_dir.
DEFAULT_CACHE_DIR = "~/.cache/mar_xla"


def enable_compilation_cache(cache_dir: str,
                             min_compile_time_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at `cache_dir`.

    Safe to call more than once; returns the absolute cache path.  Programs
    cheaper than `min_compile_time_secs` are not cached (avoids churning the
    directory with trivial kernels).
    """
    import jax

    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache everything regardless of entry size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def enable_test_cache() -> str | None:
    """The test suite's shared cache policy (conftest + every subprocess
    child a test spawns — one definition, no drift): ~/.cache/mar_test_xla,
    2 s compile threshold, disabled by MAR_TEST_COMPILE_CACHE=0."""
    if os.environ.get("MAR_TEST_COMPILE_CACHE", "1") == "0":
        return None
    return enable_compilation_cache(
        os.path.expanduser("~/.cache/mar_test_xla"),
        min_compile_time_secs=2.0)
