"""Remat-policy sweep for fine-tuning the Swin tower (--video_freeze false).

The unfrozen tri-modal train row (results_v5e.json
7_trimodal_finetune_unfrozen) checkpoints every SwinBlock3d with the
save-nothing policy.  This times value_and_grad of the full swin3d_t
backbone at the bench's backbone shape (batch 8 clips x 16 windows = 128
8-frame 112px windows) under:

  block       — per-block remat, save-nothing policy (production default)
  block_dots  — per-block remat, dots_with_no_batch_dims_saveable (saves
                matmul outputs, recomputes elementwise)
  none        — no remat (every intermediate saved; HBM permitting)

Usage: python benchmarks/profile_finetune_remat.py [--windows 128]
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
    p.add_argument("--bf16", action="store_true",
                   help="cast params+inputs to bfloat16 (halves activation "
                        "memory; the fine-tune lever VERDICT r3 item 3 asks "
                        "to measure)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        Swin3dTExtractor)

    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(
        (args.windows, args.frames, args.size, args.size, 3)) * 0.3,
        np.float32)

    report = {"device": str(jax.devices()[0]), "windows": args.windows}
    variables = None
    for name, kwargs in (
            ("block", dict(remat=True)),
            ("block_dots", dict(remat=True, remat_policy="dots")),
            ("none", dict(remat=False))):
        model = Swin3dTExtractor(**kwargs)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                            jnp.asarray(x[:2]))
            if args.bf16:
                from multimodalaggressionrecognition_tpu.utils.precision import (
                    cast_floating)

                variables = {"params": cast_floating(variables["params"],
                                                     "bfloat16")}
                x = cast_floating(x, "bfloat16")

        def loss(params, xx, model=model):
            # fixed dropout key: fine for timing (stochastic depth draw)
            f = model.apply({"params": params}, xx, train=True,
                            rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.sum(f * f)

        grad = jax.jit(jax.value_and_grad(loss))

        def grad_scalar(v, xx):
            # reduce EVERY grad leaf into the carried scalar: _device_time
            # keeps only the first output leaf live, so returning the raw
            # grad tree lets XLA skip the weight-gradient GEMMs of all
            # other layers (and returning only the value skipped the whole
            # backward — the r3 sweep's numbers were forwards-only).
            g = grad(v["params"], xx)[1]
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(g))

        try:
            dt = _device_time(grad_scalar, variables, x,
                              iters=args.iters, nbuf=2)
            report[name] = {"ms": round(dt * 1e3, 2),
                            "clips_per_sec_16win": round(
                                (args.windows / 16) / dt, 1)}
        except Exception as e:  # e.g. HBM OOM for the no-remat mode
            report[name] = {"error": str(e)[:200]}
        print(name, report[name], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
