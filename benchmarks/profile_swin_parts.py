"""Micro-costs of the non-attention Swin pieces at stage0 shapes.

After the fused window-attention kernel, stage0 is still 24 ms / 128
windows.  This times the remaining pieces in isolation — window partition +
reverse transposes, the shift roll, LayerNorm, the MLP, qkv+proj linears —
to decide what a partition-free kernel (BlockSpec windowing directly on the
(B,T,H,W,C) activation) would actually save.

Usage: python benchmarks/profile_swin_parts.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_all import _device_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        _window_partition, _window_reverse)

    b, t, h, w, c = 128, 4, 28, 28, 96
    window = (4, 7, 7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, h, w, c)).astype(np.float32))
    report = {}

    def tm(name, fn, params, inputs, iters=50):
        ms = _device_time(fn, params, inputs, iters=iters) * 1e3
        report[name] = round(ms, 3)
        print(f"# {name}: {ms:.3f} ms", flush=True)

    tm("partition_reverse", lambda p, xx: _window_reverse(
        _window_partition(xx, window) * p, window, b, t, h, w),
       jnp.float32(1.000001), x)
    tm("roll_both", lambda p, xx: jnp.roll(
        jnp.roll(xx, (-2, -3, -3), axis=(1, 2, 3)) * p, (2, 3, 3),
        axis=(1, 2, 3)), jnp.float32(1.000001), x)

    from multimodalaggressionrecognition_tpu.models.layers import (
        TorchLayerNorm, TorchLinear)
    import flax.linen as nn

    ln = TorchLayerNorm()
    v = ln.init(jax.random.PRNGKey(0), x)
    tm("layernorm", lambda vv, xx: ln.apply(vv, xx), v, x)

    from multimodalaggressionrecognition_tpu.ops.erf import gelu_exact

    class Mlp(nn.Module):
        gelu: str = "erf"

        @nn.compact
        def __call__(self, xx):
            hdn = TorchLinear(4 * c, name="fc1")(xx)
            if self.gelu == "poly":
                hdn = gelu_exact(hdn)
            else:
                hdn = nn.gelu(hdn, approximate=self.gelu == "tanh")
            return TorchLinear(c, name="fc2")(hdn)

    v = Mlp().init(jax.random.PRNGKey(0), x)
    for mode in ("erf", "poly", "tanh"):
        mlp = Mlp(gelu=mode)  # 'poly' is the production default (swin3d.py)
        tm(f"mlp_gelu_{mode}", lambda vv, xx, m=mlp: m.apply(vv, xx), v, x)

    class Qkv(nn.Module):
        @nn.compact
        def __call__(self, xx):
            return TorchLinear(3 * c, name="qkv")(xx)

    qkv = Qkv()
    v = qkv.init(jax.random.PRNGKey(0), x)
    tm("qkv_linear", lambda vv, xx: qkv.apply(vv, xx), v, x)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
