"""Decompose the unfrozen tri-modal fine-tune step (results_v5e.json
7_trimodal_finetune_unfrozen).

  forward   — model.apply only (no grad)
  vjp       — value_and_grad of the full loss (no optimizer update); the
              jit declares both outputs so the backward cannot be DCE'd
  step      — the production train step (vjp + adam + metrics)

Measured v5e @ b8/128f: f32 fwd 44 / vjp 170 / step 172 ms; bf16 35 /
129 / 134.  vjp ~= 3x forward — the expected shape for save-nothing
per-block remat (forward + full recompute + backward).  This script also
exposed the r3 remat sweep's dead-code bug (it measured forwards only).
`--xla_attention` re-traces under utils.kernels.force_xla() to A/B the
Pallas flash window-attention against XLA's lowering inside the full
step.

Usage: python benchmarks/profile_finetune_step.py [--batch 8] [--bf16]
       [--xla_attention]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _host_loop_time(fn, n=10, windows=3):
    best = float("inf")
    out = fn()  # compile
    _ = np.asarray(out[0]) if isinstance(out, tuple) else np.asarray(out)
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf)  # completion barrier
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--modalities", default="audio,text,video",
                   help="bisect: which towers to build (e.g. 'video' times "
                        "the video path alone)")
    p.add_argument("--no_remat", action="store_true",
                   help="video_remat=False (the tuned config: at the bench "
                        "shape activations fit HBM and recompute is pure "
                        "overhead)")
    p.add_argument("--xla_attention", action="store_true",
                   help="trace with utils.kernels.force_xla(): A/B the "
                        "Pallas flash window-attention fwd+bwd against "
                        "XLA's attention lowering in the full step")
    args = p.parse_args()

    import contextlib

    import jax
    import jax.numpy as jnp
    import optax

    if args.xla_attention:
        from multimodalaggressionrecognition_tpu.utils.kernels import force_xla
        stack = contextlib.ExitStack()
        stack.enter_context(force_xla())

    from __graft_entry__ import _batch
    from multimodalaggressionrecognition_tpu.cli.train_multimodal import (
        MultimodalConfig, build_model)
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    dtype = "bfloat16" if args.bf16 else None
    mods = tuple(sorted(args.modalities.split(",")))
    cfg = MultimodalConfig(video_frames=args.frames, video_size=args.size,
                           video_window=args.window, video_freeze=False,
                           video_remat=not args.no_remat,
                           modalities=args.modalities)
    model = build_model(cfg, mods)
    rng = np.random.default_rng(0)
    modalities = _batch(args.batch, 80000, 48, 768)
    modalities["video"] = {
        "data": rng.standard_normal(
            (args.batch, args.frames, args.size, args.size, 3)).astype(
                np.float32) * 0.3,
        "present": np.ones((args.batch,), np.float32)}
    modalities = {m: modalities[m] for m in mods}
    full_batch = jax.tree.map(jax.device_put, {
        "modalities": modalities,
        "labels": {"phys": np.zeros((args.batch,), np.int32),
                   "verb": (np.arange(args.batch) % 2).astype(np.int32)},
        "label_mask": {"phys": np.ones((args.batch,), np.float32),
                       "verb": np.ones((args.batch,), np.float32)},
        "sample_mask": np.ones((args.batch,), np.float32),
    })
    state = create_train_state(model, full_batch["modalities"],
                               optax.adam(1e-3))
    report = {"device": str(jax.devices()[0]), "batch": args.batch,
              "dtype": dtype or "float32", "modalities": args.modalities,
              "remat": not args.no_remat,
              "attention": "xla" if args.xla_attention else "auto"}

    # ---- forward only
    from multimodalaggressionrecognition_tpu.utils.precision import (
        cast_floating)

    fwd_vars = {"params": state.params, **state.model_state}
    fwd_mods = full_batch["modalities"]
    if dtype:
        fwd_vars = dict(fwd_vars, params=cast_floating(state.params, dtype))
        fwd_mods = cast_floating(fwd_mods, dtype)
    fwd = jax.jit(lambda v, m: model.apply(v, m))
    report["forward_ms"] = round(
        _host_loop_time(lambda: fwd(fwd_vars, fwd_mods)["verb"]) * 1e3, 2)

    # ---- full-loss vjp (no optimizer)
    specs = {"phys": LossSpec("ce"), "verb": LossSpec("ce")}
    from multimodalaggressionrecognition_tpu.train.steps import (
        _head_losses_and_metrics)

    # the batch must be a jit ARGUMENT, not a closure: a closed-over device
    # array is embedded in the lowered module as a constant, and at b16 the
    # 308 MB video block blows the axon remote-compile transport's body
    # limit (HTTP 413 — the r3/r4 "b16 unmeasurable" blocker)
    def loss_fn(params, batch):
        if dtype:
            params = cast_floating(params, dtype)
        mods = cast_floating(batch["modalities"], dtype) if dtype \
            else batch["modalities"]
        mutable = list(state.model_state.keys())
        out = model.apply({"params": params, **state.model_state}, mods,
                          train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=mutable)
        if mutable:
            out = out[0]
        total, _ = _head_losses_and_metrics(out, batch, specs, 2)
        return total

    vjp = jax.jit(jax.value_and_grad(loss_fn))
    report["vjp_ms"] = round(
        _host_loop_time(lambda: vjp(state.params, full_batch)[0]) * 1e3, 2)

    # ---- full production step
    step = make_train_step(model, specs, num_classes=2, donate=False,
                           compute_dtype=dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    holder = {"s": state}

    def one_step():
        holder["s"], m = step(holder["s"], full_batch, keys[0])
        return m["total_loss"]

    report["step_ms"] = round(_host_loop_time(one_step) * 1e3, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
