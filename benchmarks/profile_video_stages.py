"""Per-stage cost decomposition of the R3D video tower (on-device loop).

Trace capture through the axon tunnel only yields fragments, so this times
each prefix of the network (stem, stem+layer1, ...) with the same
readback-synced on-device loop bench_all uses, and reports per-stage deltas.
Also times the mask-blend pyramid alone and the stem at bf16.

Usage: python benchmarks/profile_video_stages.py [--batch 8] [--frames 16]
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.r3d import (
        _LAYERS, BasicBlock3d, R3DStem, _resize_nearest_3d)

    b, f, s = args.batch, args.frames, args.size
    rng = np.random.default_rng(0)
    frames_x = jnp.asarray(
        rng.standard_normal((b, f, s, s, 3)).astype(np.float32) * 0.3)
    mask = jnp.asarray((rng.uniform(0, 1, (b, f, s, s, 1)) > 0.5)
                       .astype(np.float32))

    class Prefix(nn.Module):
        """First `depth` stages of R3DWithBboxes (with mask blends)."""

        depth: int
        alpha: float = 0.4
        use_mask: bool = True

        @nn.compact
        def __call__(self, x, m):
            stages = [R3DStem(name="stem")]
            for i, (feats, stride) in enumerate(_LAYERS, start=1):
                stages.append((f"layer{i}", feats, stride))
            h = x
            for stage in stages[: self.depth]:
                if self.use_mask:
                    t, hh, ww = h.shape[1:4]
                    if m.shape[1:4] != (t, hh, ww):
                        m = _resize_nearest_3d(m, t, hh, ww)
                    h = (1.0 - self.alpha) * h + self.alpha * m
                if isinstance(stage, R3DStem):
                    h = stage(h)
                else:
                    name, feats, stride = stage
                    h = BasicBlock3d(feats, stride, name=f"{name}_0")(h)
                    h = BasicBlock3d(feats, 1, name=f"{name}_1")(h)
            return h

    report = {"device": str(jax.devices()[0]), "batch": b, "frames": f}
    names = ["stem", "layer1", "layer2", "layer3", "layer4"]
    prev = 0.0
    for depth in range(1, 6):
        model = Prefix(depth=depth)
        variables = model.init(jax.random.PRNGKey(0), frames_x, mask)
        dt = _device_time(lambda v, t: model.apply(v, t["x"], t["m"]),
                          variables, {"x": frames_x, "m": mask},
                          iters=20, nbuf=2)
        ms = dt * 1e3
        report[f"prefix_{names[depth - 1]}_ms"] = round(ms, 3)
        report[f"delta_{names[depth - 1]}_ms"] = round(ms - prev, 3)
        prev = ms
        print(f"# prefix through {names[depth - 1]}: {ms:.3f} ms", flush=True)

    # mask-blend overhead: full depth with vs without blending
    no_mask = Prefix(depth=5, use_mask=False)
    variables = no_mask.init(jax.random.PRNGKey(0), frames_x, mask)
    dt = _device_time(lambda v, t: no_mask.apply(v, t["x"], t["m"]),
                      variables, {"x": frames_x, "m": mask},
                      iters=20, nbuf=2)
    report["full_no_mask_ms"] = round(dt * 1e3, 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
