"""Per-stage cost decomposition of the Swin3D-T extractor forward.

The trimodal config (16 x 8-frame windows per 128-frame clip) measured 84
clips/s at batch 8 = ~95 ms for 128 windows through swin3d_t — single-digit
MFU.  This times patch-embed and each stage prefix (depths truncation) with
the readback-synced on-device loop to locate the cost.

Usage: python benchmarks/profile_swin.py [--windows 128] [--frames 8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_all import _device_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=128)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)

    b, f, s = args.windows, args.frames, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, f, s, s, 3)).astype(np.float32) * 0.3)

    report = {"device": str(jax.devices()[0]), "windows": b, "frames": f}
    full_depths = (2, 2, 6, 2)
    full_heads = (3, 6, 12, 24)
    prev = 0.0
    for k in range(0, 5):
        if k == 0:
            model = SwinTransformer3d(depths=(), num_heads=())
            name = "patch_embed"
        else:
            model = SwinTransformer3d(depths=full_depths[:k],
                                      num_heads=full_heads[:k])
            name = f"stage{k - 1}"
        variables = model.init(jax.random.PRNGKey(0), x)
        dt = _device_time(lambda v, xx: jnp.mean(model.apply(v, xx)),
                          variables, x, iters=args.iters)
        ms = dt * 1e3
        report[f"prefix_{name}_ms"] = round(ms, 3)
        report[f"delta_{name}_ms"] = round(ms - prev, 3)
        prev = ms
        print(f"# prefix through {name}: {ms:.3f} ms", flush=True)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
