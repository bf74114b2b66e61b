"""Cross-check the two timing methodologies on the SAME fine-tune vjp.

STATUS's open question: the raw Swin backbone value_and_grad measures
34 ms bf16 (profile_finetune_remat.py, amortized on-device `_device_time`
loop) while the full tri-modal fine-tune step measures ~110 ms
(profile_finetune_step.py, host loop with per-window readback).  Which
part of the gap is model (CNN1D + fusion + heads + losses) and which is
methodology (tunnel dispatch/readback in the host loop)?

This times the IDENTICAL jitted value_and_grad of the full tuned-config
loss (bf16, no-remat, audio+text+video) two ways:

  vjp_host_ms    — profile_finetune_step's host loop (10 calls/window,
                   one D2H readback per window)
  vjp_device_ms  — bench_all._device_time (on-device fori_loop over 2
                   distinct batches, scalar carry).  The carried scalar
                   sums EVERY grad leaf so the backward cannot be DCE'd
                   (the r3 sweep bug).

and, for symmetry, the raw Swin backbone vjp through the HOST loop
(profile_finetune_remat measured it only amortized).

Usage: python benchmarks/profile_finetune_xcheck.py [--batch 8] [--bf16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_all import _device_time  # noqa: E402
from profile_finetune_step import _host_loop_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _batch
    from multimodalaggressionrecognition_tpu.cli.train_multimodal import (
        MultimodalConfig, build_model)
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import (
        _head_losses_and_metrics)
    from multimodalaggressionrecognition_tpu.utils.precision import (
        cast_floating)

    dtype = "bfloat16" if args.bf16 else None
    mods = ("audio", "text", "video")
    cfg = MultimodalConfig(video_frames=args.frames, video_size=args.size,
                           video_window=args.window, video_freeze=False,
                           video_remat=False, modalities=",".join(mods))
    model = build_model(cfg, mods)
    rng = np.random.default_rng(0)
    modalities = _batch(args.batch, 80000, 48, 768)
    modalities["video"] = {
        "data": rng.standard_normal(
            (args.batch, args.frames, args.size, args.size, 3)).astype(
                np.float32) * 0.3,
        "present": np.ones((args.batch,), np.float32)}
    full_batch = jax.tree.map(jax.device_put, {
        "modalities": {m: modalities[m] for m in mods},
        "labels": {"phys": np.zeros((args.batch,), np.int32),
                   "verb": (np.arange(args.batch) % 2).astype(np.int32)},
        "label_mask": {"phys": np.ones((args.batch,), np.float32),
                       "verb": np.ones((args.batch,), np.float32)},
        "sample_mask": np.ones((args.batch,), np.float32),
    })
    state = create_train_state(model, full_batch["modalities"],
                               optax.adam(1e-3))
    specs = {"phys": LossSpec("ce"), "verb": LossSpec("ce")}

    def loss_fn(params, batch):
        if dtype:
            params = cast_floating(params, dtype)
        b_mods = cast_floating(batch["modalities"], dtype) if dtype \
            else batch["modalities"]
        mutable = list(state.model_state.keys())
        out = model.apply({"params": params, **state.model_state}, b_mods,
                          train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=mutable)
        if mutable:
            out = out[0]
        total, _ = _head_losses_and_metrics(
            out, batch, specs, 2)
        return total

    vjp = jax.jit(jax.value_and_grad(loss_fn))

    report = {"device": str(jax.devices()[0]), "batch": args.batch,
              "dtype": dtype or "float32", "iters": args.iters}

    # ---- host loop (profile_finetune_step methodology)
    report["vjp_host_ms"] = round(_host_loop_time(
        lambda: vjp(state.params, full_batch)[0], n=args.iters) * 1e3, 2)

    # ---- on-device amortized loop; every grad leaf feeds the carry
    def vjp_scalar(params, batch):
        v, g = vjp(params, batch)
        return v + sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(g))

    report["vjp_device_ms"] = round(_device_time(
        vjp_scalar, state.params, full_batch,
        iters=args.iters, nbuf=2) * 1e3, 2)

    # ---- raw Swin backbone vjp, HOST loop (remat sweep used device loop)
    from multimodalaggressionrecognition_tpu.models.swin3d import (
        Swin3dTExtractor)

    windows = args.batch * (args.frames // args.window)
    xw = np.asarray(rng.standard_normal(
        (windows, args.window, args.size, args.size, 3)) * 0.3, np.float32)
    swin = Swin3dTExtractor(remat=False)
    swin_vars = jax.jit(swin.init)(jax.random.PRNGKey(0), jnp.asarray(xw[:2]))
    if dtype:
        swin_vars = {"params": cast_floating(swin_vars["params"], dtype)}
        xw = cast_floating(xw, dtype)
    xw = jax.device_put(xw)

    def swin_loss(params, xx):
        f = swin.apply({"params": params}, xx, train=True,
                       rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(f * f)

    swin_grad = jax.jit(jax.value_and_grad(swin_loss))

    def swin_scalar(v, xx):
        val, g = swin_grad(v["params"], xx)
        return val + sum(jnp.sum(leaf.astype(jnp.float32))
                         for leaf in jax.tree.leaves(g))

    report["swin_vjp_host_ms"] = round(_host_loop_time(
        lambda: swin_scalar(swin_vars, xw), n=args.iters) * 1e3, 2)
    report["swin_vjp_device_ms"] = round(_device_time(
        swin_scalar, swin_vars, xw, iters=args.iters, nbuf=2) * 1e3, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
