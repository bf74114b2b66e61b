"""Op-level hotspot profile of the video 3D-CNN forward (R3DWithBboxes).

The video tower is the farthest config from roofline (718 clips/s f32 at
16f@112; ~41 GFLOP/clip forward -> ~29 TFLOP/s, well under the chip's MXU
rate), so this captures a jax.profiler trace of the jitted forward and
prints the top ops by self time to find where it goes: the C=3 stem conv
(3 channels in a 128-lane unit), a specific stage, or mask-blend overhead.

Usage: python benchmarks/profile_video.py [--batch 8] [--frames 16]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump_xplane(out_dir, top=25):
    planes = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not planes:
        print("NO XPLANE CAPTURED")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as f:
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
        print(f"== plane {plane.name}: {total_us:.1f} us summed")
        for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ps / 1e9:9.1f} us  {name[:140]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--out", default="/tmp/jaxtrace_video")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.r3d import R3DWithBboxes

    model = R3DWithBboxes(class_num=4)
    rng = np.random.default_rng(0)
    b, f, s = args.batch, args.frames, args.size
    frames_x = jnp.asarray(
        rng.standard_normal((b, f, s, s, 3)).astype(np.float32) * 0.3)
    mask = jnp.asarray((rng.uniform(0, 1, (b, f, s, s, 1)) > 0.5)
                       .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames_x, mask)

    @jax.jit
    def run(v, x, m):
        def body(i, carry):
            return carry + jnp.sum(model.apply(v, x, m))

        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    float(run(variables, frames_x, mask))  # compile + settle
    with jax.profiler.trace(args.out):
        float(run(variables, frames_x, mask))
    dump_xplane(args.out)


if __name__ == "__main__":
    main()
