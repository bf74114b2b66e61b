"""Capture a jax.profiler trace of the flagship train step and print the
top ops by self time (uses tensorboard_plugin_profile to parse the xplane).

Usage: python benchmarks/capture_trace.py [--mode sgd|step|fwd] [--out DIR]
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="sgd", choices=["sgd", "step", "fwd"])
    p.add_argument("--out", default="/tmp/jaxtrace")
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    batch = args.batch
    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)
    modalities = jax.tree.map(jax.device_put, _batch(batch, 80000, 48, 768))
    variables = model.init(jax.random.PRNGKey(0), modalities)
    rng = jax.random.PRNGKey(1)
    labels = {"phys": jnp.zeros((batch,), jnp.int32),
              "verb": jnp.asarray(np.arange(batch) % 2, jnp.int32)}
    specs = {"phys": LossSpec("focal", class_weights=(0.5, 0.5)),
             "verb": LossSpec("ce")}
    mask = jnp.ones((batch,), jnp.float32)

    def full_loss(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            b, train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        return sum(specs[h](out[h], labels[h], mask) for h in out)

    if args.mode == "sgd":
        @jax.jit
        def run(params, b):
            def body(i, carry):
                p, acc = carry
                loss, grads = jax.value_and_grad(full_loss)(p, b)
                p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads)
                return p, acc + loss

            _, acc = jax.lax.fori_loop(0, 10, body,
                                       (params, jnp.float32(0)))
            return acc

        arg0 = variables["params"]
    elif args.mode == "step":
        state = create_train_state(model, modalities, optax.adam(1e-3))
        step = make_train_step(model, specs, num_classes=2, donate=False)
        full_batch = {"modalities": modalities, "labels": labels,
                      "label_mask": {"phys": jnp.zeros((batch,), jnp.float32),
                                     "verb": mask},
                      "sample_mask": mask}

        @jax.jit
        def run(st, b):
            def body(i, carry):
                s, acc = carry
                s, m = step(s, b, jax.random.fold_in(rng, i))
                return s, acc + m["total_loss"]

            _, acc = jax.lax.fori_loop(0, 10, body, (st, jnp.float32(0)))
            return acc

        arg0, modalities = state, full_batch
    else:
        @jax.jit
        def run(v, b):
            def body(i, carry):
                out = model.apply(v, b)
                return carry + jnp.sum(out["verb"])

            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        arg0 = variables

    # compile + warm
    float(run(arg0, modalities))
    with jax.profiler.trace(args.out):
        float(run(arg0, modalities))

    planes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not planes:
        print("NO XPLANE CAPTURED (profiling unsupported on this backend?)")
        return
    xplane = planes[-1]
    print("xplane:", xplane)

    # Parse the xplane proto directly: the installed
    # tensorboard_plugin_profile's generated protos clash with the newer
    # protobuf/TF in this image, but the raw schema ships with TF itself.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = {}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                tot[name] = tot.get(name, 0) + ev.duration_ps
        if not tot:
            continue
        total_us = sum(tot.values()) / 1e9
        print(f"== plane {plane.name}: {len(plane.lines)} lines, "
              f"{total_us:.1f} us summed")
        for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ps / 1e9:9.1f} us  {name[:120]}")
    # Caveat (axon tunnel): device planes may contain only a fragment of
    # the window; prefer the on-device-loop timings in profile_train.py
    # for end-to-end numbers and use this for op-level hotspot hints.


if __name__ == "__main__":
    main()
