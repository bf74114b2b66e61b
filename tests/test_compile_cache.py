"""Persistent XLA compilation cache (utils/compile_cache.py): restarted
serving/training processes skip recompilation of byte-identical programs."""

import os

import jax
import jax.numpy as jnp


import contextlib


@contextlib.contextmanager
def _restore_cache_config():
    """enable_compilation_cache mutates global jax config; undo after the
    test so the rest of the suite doesn't write to this test's tmpdir."""
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    saved = {k: jax.config._read(k) for k in keys}
    # conftest already initialized the session-wide cache instance; jax pins
    # it at first use, so re-pointing the config dir needs an explicit reset
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    try:
        yield
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)
        _cc.reset_cache()


def test_compilation_cache_writes_and_hits(tmp_path):
    from multimodalaggressionrecognition_tpu.utils.compile_cache import (
        enable_compilation_cache)

    with _restore_cache_config():
        d = enable_compilation_cache(str(tmp_path / "cc"),
                                     min_compile_time_secs=0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((64, 64))).block_until_ready()
        entries = [e for e in os.listdir(d) if "jit_f" in e]
        assert entries, f"no cache entry written in {os.listdir(d)}"

        # a byte-identical program is a disk hit, not a rewrite: entry mtime
        # unchanged after clearing jax's in-memory caches and re-jitting
        path = os.path.join(d, entries[0])
        mtime = os.path.getmtime(path)
        jax.clear_caches()

        @jax.jit
        def f2(x):
            return jnp.tanh(x) @ x.T

        f2(jnp.ones((64, 64))).block_until_ready()
        assert os.path.getmtime(path) == mtime


def test_predictor_accepts_cache_dir(tmp_path):
    import numpy as np

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.serve import Predictor

    with _restore_cache_config():
        model = _flagship(hidden=64, audio_len=16000, text_len=8)
        host = _batch(2, 16000, 8, 64)
        variables = model.init(jax.random.PRNGKey(0), host)
        p = Predictor(model, variables, batch_size=2,
                      cache_dir=str(tmp_path / "serve_cc"))
        out = p.predict({"audio": host["audio"]["data"],
                         "text": host["text"]["data"]})
        assert np.all(np.isfinite(out["phys"]))
        assert os.path.isdir(str(tmp_path / "serve_cc"))
