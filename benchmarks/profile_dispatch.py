"""Host-driven donated train steps vs the on-device fori_loop.

The on-device loop (bench_all._device_time / bench_multimodal) pays XLA
while-loop copy insertion on the loop-carried TrainState (~2-3 ms/step at
b32, see results_v5e.json train_note).  The deployable alternative is the
plain host loop with buffer donation (make_train_step donate=True): each
step consumes the previous state's buffers in place, and dispatch overlaps
compute via async enqueue.  On a co-located host this is the production
path; through the axon tunnel per-call dispatch may dominate — this script
measures exactly that trade.

Usage: python benchmarks/profile_dispatch.py [--batch 32] [--steps 100]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()
    batch = args.batch

    import jax
    import optax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)
    specs = {"phys": LossSpec("focal", class_weights=(0.5, 0.5)),
             "verb": LossSpec("ce")}

    nbuf = 8
    batches = []
    for s in range(nbuf):
        modalities = _batch(batch, 80000, 48, 768, seed=s)
        batches.append(jax.tree.map(jax.device_put, {
            "modalities": modalities,
            "labels": {"phys": np.zeros((batch,), np.int32),
                       "verb": (np.arange(batch) % 2).astype(np.int32)},
            "label_mask": {"phys": np.zeros((batch,), np.float32),
                           "verb": np.ones((batch,), np.float32)},
            "sample_mask": np.ones((batch,), np.float32),
        }))

    state = create_train_state(model, batches[0]["modalities"],
                               optax.adam(1e-3))
    step = make_train_step(model, specs, num_classes=2, donate=True)
    # pre-split rng keys: each is its own device buffer, so the timed loop
    # dispatches ONLY the train step (no per-step fold_in round trips)
    keys = list(jax.random.split(jax.random.PRNGKey(0), 3 + 3 * args.steps))

    # compile + settle
    for i in range(3):
        state, metrics = step(state, batches[i % nbuf], keys[i])
    float(metrics["total_loss"])  # readback barrier

    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, batches[i % nbuf],
                                  keys[3 + w * args.steps + i])
        float(metrics["total_loss"])  # completion barrier
        best = min(best, (time.perf_counter() - t0) / args.steps)

    print(json.dumps({
        "device": str(jax.devices()[0]),
        "batch": batch,
        "host_loop_donated_ms_per_step": round(best * 1e3, 3),
        "host_loop_donated_clips_per_sec": round(batch / best, 1),
    }))


if __name__ == "__main__":
    main()
