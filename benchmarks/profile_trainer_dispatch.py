"""A/B the Trainer epoch loop's host-sync behavior (round 5).

The epoch loops used to fold metrics into host-numpy accumulators —
`np.asarray` per metric per step, a blocking D2H readback that serialized
every train step behind a full dispatch round trip.  train/loop.py now
accumulates ON DEVICE (loop._acc_step) with a bounded in-flight throttle,
so the host enqueues steps ahead of the device and reads back once per
epoch.

This times Trainer.train_epoch on the flagship audio+text configuration
(b32; ~1 ms device step, so dispatch latency dominates) twice:

  device_acc — the production path (device-side accumulation)
  host_acc   — the instance's _accumulate monkeypatched back to the
               legacy host-numpy fold (per-step np.asarray readbacks)

Through the dev tunnel (~130 ms RTT) the legacy path costs ~RTT per step;
co-located the gap shrinks but the per-step sync still caps dispatch
run-ahead.  Batches are PRE-BUILT numpy (no loader cost) so the delta is
pure loop/dispatch behavior.

Usage: python benchmarks/profile_trainer_dispatch.py [--batches 30]
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
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--inflight", type=int, default=None,
                   help="override Trainer inflight_steps (throttle depth)")
    args = p.parse_args()

    import jax
    import optax

    from __graft_entry__ import _batch
    from multimodalaggressionrecognition_tpu.cli.train_multimodal import (
        MultimodalConfig, build_model)
    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    mods = ("audio", "text")
    cfg = MultimodalConfig(modalities=",".join(mods))
    model = build_model(cfg, mods)

    batches = []
    for i in range(args.batches):
        b = args.batch_size
        modalities = _batch(b, 80000, 48, 768, seed=i)
        batches.append({
            "modalities": {m: modalities[m] for m in mods},
            "labels": {"phys": (np.arange(b) % 2).astype(np.int32),
                       "verb": ((np.arange(b) + 1) % 2).astype(np.int32)},
            "label_mask": {"phys": np.ones((b,), np.float32),
                           "verb": np.ones((b,), np.float32)},
            "sample_mask": np.ones((b,), np.float32),
        })
    # pre-stage every batch on device ONCE: device_prefetch's device_put of
    # an already-committed device array is a no-op, so the timed epochs
    # carry zero H2D — through the dev tunnel (~35 MB/s) per-epoch uploads
    # would otherwise dominate both variants and mask the dispatch delta
    batches = [jax.tree.map(jax.device_put, b) for b in batches]

    def make_trainer(tag):
        kw = {} if args.inflight is None else {"inflight_steps": args.inflight}
        return Trainer(model, {"phys": LossSpec("ce"), "verb": LossSpec("ce")},
                       optax.adam(1e-3), batches, batches, num_classes=2,
                       saving_dir="/tmp/trainer_dispatch_ab", model_name=tag,
                       log_console=False, handle_preemption=False, **kw)

    def legacy_accumulate(acc, metrics, sample_mask=None):
        """The pre-round-5 host-numpy fold: blocking readback per step."""
        for head, m in metrics.items():
            if head == "total_loss":
                continue
            slot = acc.setdefault(head, {"loss": 0.0, "valid": 0.0,
                                         "confusion": 0.0})
            slot["loss"] += np.asarray(m["loss"]) * np.asarray(m["valid"])
            slot["valid"] += np.asarray(m["valid"])
            slot["confusion"] += np.asarray(m["confusion"])
        if sample_mask is not None:
            acc["_samples"] = (acc.get("_samples", np.float32(0.0))
                               + np.asarray(sample_mask).sum())
        return acc

    report = {"device": str(jax.devices()[0]), "batches": args.batches,
              "batch_size": args.batch_size}
    results = {}
    for tag in ("device_acc", "host_acc"):
        t = make_trainer(tag)
        if tag == "host_acc":
            t._accumulate = legacy_accumulate
        # one warmup epoch: compiles the step + accumulate programs
        t.train_epoch(jax.random.PRNGKey(0))
        best = float("inf")
        for r in range(args.repeats):
            t0 = time.perf_counter()
            res, snap = t.train_epoch(jax.random.PRNGKey(r + 1))
            best = min(best, time.perf_counter() - t0)
        results[tag] = {
            "epoch_s": round(best, 3),
            "ms_per_step": round(best / args.batches * 1e3, 2),
            "clips_per_sec": round(snap["samples"] / best, 1)}
        report[tag] = results[tag]
    report["speedup"] = round(results["host_acc"]["epoch_s"]
                              / results["device_acc"]["epoch_s"], 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
