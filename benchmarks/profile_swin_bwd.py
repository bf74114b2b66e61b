"""Trainable-Swin backward cost: Pallas flash backward vs the alternatives.

The fused window-attention forward kernel (ops/pallas/window_attention.py)
keeps the (W, heads, N, N) score tensor out of HBM.  Before round 3 its
custom VJP recomputed through the XLA reference, re-materializing exactly
that traffic on the backward; now the backward is a flash-style Pallas
kernel of its own.  This times value_and_grad of the full swin3d_t
backbone (the fine-tuning regime the README advertises; the reference
always froze Swin — reference models.py:49-59) under three modes:

  xla        — XLA attention forward + XLA backward (use_pallas=False)
  recompute  — Pallas forward + XLA-recompute backward (the round-2 VJP)
  pallas     — Pallas forward + Pallas flash backward (current default)

Usage: python benchmarks/profile_swin_bwd.py [--windows 32] [--iters 10]
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_all import _device_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)
    from multimodalaggressionrecognition_tpu.ops.pallas import (
        window_attention as wa)

    b, f, s = args.windows, args.frames, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, f, s, s, 3)).astype(np.float32) * 0.3)

    report = {"device": str(jax.devices()[0]), "windows": b, "frames": f}

    # Round-2 VJP, reconstructed for comparison: Pallas forward, backward
    # recomputes through the XLA reference.
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def recompute_attn(qkv, bias, mask, heads):
        interpret = jax.default_backend() != "tpu"
        return wa._fused_fwd(qkv, bias, mask, heads, interpret)

    def _fwd(qkv, bias, mask, heads):
        return recompute_attn(qkv, bias, mask, heads), (qkv, bias, mask)

    def _bwd(heads, res, g):
        qkv, bias, mask = res
        _, vjp = jax.vjp(
            lambda a, b_: wa.attention_core_ref(a, b_, mask, heads),
            qkv, bias)
        d_qkv, d_bias = vjp(g)
        return d_qkv, d_bias, None

    recompute_attn.defvjp(_fwd, _bwd)

    fused_orig = wa.fused_window_attention
    modes = {
        # Route through plain XLA attention (normal AD both directions).
        "xla": wa.attention_core_ref,
        "recompute": recompute_attn,
        "pallas": fused_orig,
    }
    for name, attn in modes.items():
        wa.fused_window_attention = attn
        try:
            model = SwinTransformer3d()
            variables = model.init(jax.random.PRNGKey(0), x)

            def loss(v, xx, model=model):
                return jnp.mean(model.apply(v, xx) ** 2)

            dt = _device_time(
                lambda v, xx: jax.value_and_grad(loss)(v, xx)[0],
                variables, x, iters=args.iters)
            report[f"grad_{name}_ms"] = round(dt * 1e3, 3)
        finally:
            wa.fused_window_attention = fused_orig
    if "grad_pallas_ms" in report and "grad_recompute_ms" in report:
        report["pallas_vs_recompute_x"] = round(
            report["grad_recompute_ms"] / report["grad_pallas_ms"], 3)
        report["pallas_vs_xla_x"] = round(
            report["grad_xla_ms"] / report["grad_pallas_ms"], 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
