"""Environment sanity check for production debugging.

One JSON report answering the questions that dominate "why is my run
slow/broken" triage on a fresh host: which backend/devices jax actually
sees, whether the native decode libraries loaded (and why not), whether
the persistent compile cache is writable, which kernels auto-select
Pallas, and the library versions in play.  Optionally (--smoke) compiles
and times one tiny jitted program on the selected backend to prove the
device round-trip works at all.

The reference had nothing like this — its failure mode was a bare CUDA
stack trace (every script hard-codes `torch.device('cuda:0')`, e.g.
reference train_video_rnn.py:86).

  python -m multimodalaggressionrecognition_tpu.cli.doctor [--smoke]
"""

import argparse
import json
import os
import time


def collect(smoke: bool = False) -> dict:
    report = {}

    import flax
    import jax
    import numpy as np
    import optax

    report["versions"] = {
        "jax": jax.__version__,
        "flax": flax.__version__,
        "optax": getattr(optax, "__version__", "?"),
        "numpy": np.__version__,
    }
    try:
        import torch

        report["versions"]["torch"] = torch.__version__  # converters/tests
    except Exception:
        report["versions"]["torch"] = None

    try:
        devices = jax.devices()
        report["backend"] = jax.default_backend()
        report["devices"] = [str(d) for d in devices]
        report["process_count"] = jax.process_count()
    except Exception as e:  # no backend at all — the headline finding
        report["backend"] = None
        report["backend_error"] = f"{type(e).__name__}: {e}"

    if report.get("backend"):
        from ..utils.kernels import pallas_auto

        report["pallas_auto_kernels"] = pallas_auto()

    from ..data import native

    report["native"] = {
        "libmarhost_wav_decode": native.available(),
        "libmarvideo_mp4_decode": native.video_available(),
    }
    if not native.available() or not native.video_available():
        report["native"]["hint"] = ("build with `make -C native` "
                                    "(libmarvideo needs libav* dev libs); "
                                    "Python fallbacks are used meanwhile")

    from ..utils.compile_cache import DEFAULT_CACHE_DIR

    cache_dir = os.path.expanduser(DEFAULT_CACHE_DIR)
    entry_count = None
    if os.path.isdir(cache_dir):
        try:
            entry_count = len(os.listdir(cache_dir))
        except OSError:
            pass
    report["compile_cache"] = {
        "conventional_dir": cache_dir,
        "exists": os.path.isdir(cache_dir),
        "entries": entry_count,
        "hint": ("pass --compilation_cache_dir to any CLI to skip the "
                 "minutes-long first compile on process restarts"),
    }

    if smoke and report.get("backend"):
        import jax.numpy as jnp

        x = jnp.ones((256, 256), jnp.float32)
        f = jax.jit(lambda a: (a @ a).sum())
        t0 = time.time()
        float(f(x))  # compile + run + readback
        compile_s = time.time() - t0
        t0 = time.time()
        float(f(x))  # cached run + readback: the dispatch/readback RTT
        report["smoke"] = {
            "compile_plus_first_run_s": round(compile_s, 3),
            "cached_run_roundtrip_s": round(time.time() - t0, 3),
            "note": ("cached_run_roundtrip is dominated by dispatch + "
                     "readback latency (e.g. ~0.13s through an axon "
                     "tunnel, sub-ms co-located)"),
        }
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--smoke", action="store_true",
                   help="compile+run one tiny jitted program on the device")
    args = p.parse_args(argv)
    print(json.dumps(collect(smoke=args.smoke), indent=2))


if __name__ == "__main__":
    main()
