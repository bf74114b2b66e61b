"""A/B the extract_features lag-1 dispatch pipeline (round 5).

cli/extract_features.py used to read each batch's features back
synchronously (`np.asarray(forward(...))` per batch) — the D2H round trip
and the host-side save serialized behind device compute.  run_split now
dispatches batch N and reads back batch N-1 (MAR_EXTRACT_PIPELINE=0
forces the old sequential order), so the readback + host work overlap
compute.

Times a full train-split extraction over synthetic clips both ways in
THIS process (env toggled between runs; the jit cache keeps the compile
out of both timings after a warmup pass).

Usage: python benchmarks/profile_extract_pipeline.py [--clips 24]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=24)
    p.add_argument("--frame_num", type=int, default=64)
    p.add_argument("--video_size", type=int, default=64)
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--backbone", default="swin3d_t")
    args = p.parse_args()

    root = tempfile.mkdtemp(prefix="extract_ab_")
    rng = np.random.default_rng(0)
    for split, n in (("train", args.clips), ("test", 1)):
        d = os.path.join(root, "clips", split)
        os.makedirs(d)
        for i in range(n):
            clip = rng.standard_normal(
                (args.frame_num, args.video_size, args.video_size, 3)
            ).astype(np.float32)
            np.save(os.path.join(d, f"{i}_AGGR.npy"), clip)

    from multimodalaggressionrecognition_tpu.cli import extract_features

    def run(tag, pipeline):
        os.environ["MAR_EXTRACT_PIPELINE"] = "1" if pipeline else "0"
        out = os.path.join(root, tag)
        t0 = time.perf_counter()
        extract_features.main([
            "--files_root", os.path.join(root, "clips"),
            "--out_root", out,
            "--backbone", args.backbone,
            "--frame_num", str(args.frame_num),
            "--video_size", str(args.video_size),
            "--window", str(args.window),
            "--batch_size", str(args.batch_size),
            "--compute_dtype", "bf16",
        ])
        dt = time.perf_counter() - t0
        return out, dt

    run("warmup", True)  # compile + first-touch
    report = {"clips": args.clips, "batch_size": args.batch_size,
              "frame_num": args.frame_num, "video_size": args.video_size}
    outs = {}
    for tag, pipeline in (("pipelined", True), ("sequential", False)):
        out, dt = run(tag, pipeline)
        outs[tag] = out
        report[tag] = {"seconds": round(dt, 3),
                       "clips_per_sec": round((args.clips + 1) / dt, 2)}
    # identical outputs, batch order notwithstanding
    a = sorted(os.listdir(os.path.join(outs["pipelined"], "train", "0")))
    b = sorted(os.listdir(os.path.join(outs["sequential"], "train", "0")))
    assert a == b, (a, b)
    for f in a:
        x = np.load(os.path.join(outs["pipelined"], "train", "0", f))
        y = np.load(os.path.join(outs["sequential"], "train", "0", f))
        np.testing.assert_array_equal(x, y)
    report["outputs_identical"] = True
    report["speedup"] = round(report["sequential"]["seconds"]
                              / report["pipelined"]["seconds"], 2)
    print(json.dumps(report))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
