"""Decompose the flagship train step's cost on the current device.

Times (on-device loop, best of 3 windows) each of:
  fwd            model.apply, eval mode
  fwd_train      model.apply, train mode (BN batch stats + dropout)
  vjp_full       value_and_grad of the full masked multi-head loss
  vjp_audio      value_and_grad of the audio tower alone (stem + trunk)
  vjp_stem       value_and_grad of the stem conv alone (pallas custom VJP)
  vjp_stem_xla   same with the XLA framing path (pallas_stem=False)
  vjp_fusion     value_and_grad of fusion+heads on fixed features
  opt_update     optax.adam update alone on the full grad tree
  train_step     the full make_train_step

Usage: python benchmarks/profile_train.py [--batch 32]
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
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    batch = args.batch

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.models.cnn1d import (
        AudioCnn1DExtractorWrapper)
    from multimodalaggressionrecognition_tpu.ops.pallas.framed_conv import (
        framed_conv1d)
    from multimodalaggressionrecognition_tpu.ops.framing import framed_matmul
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)
    modalities = jax.tree.map(jax.device_put, _batch(batch, 80000, 48, 768))
    variables = model.init(jax.random.PRNGKey(0), modalities)
    rng = jax.random.PRNGKey(1)
    report = {"device": str(jax.devices()[0]), "batch": batch,
              "pallas_stem": pallas}

    def ms(fn, params, inputs, **kw):
        v = round(_device_time(fn, params, inputs, **kw) * 1e3, 3)
        print(f"# measured: {v} ms", flush=True)
        return v

    # ---- forward
    report["fwd_ms"] = ms(lambda v, b: model.apply(v, b), variables, modalities)
    report["fwd_train_ms"] = ms(
        lambda v, b: model.apply(
            v, b, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])[0],
        variables, modalities)

    # ---- full loss VJP
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

    def _allsum(tree):
        return sum(jnp.sum(g) for g in jax.tree.leaves(tree))

    report["vjp_full_ms"] = ms(
        lambda p, b: _allsum(jax.value_and_grad(full_loss)(p, b)[1]),
        variables["params"], modalities)

    # ---- audio tower VJP
    tower = AudioCnn1DExtractorWrapper(768, pallas_stem=pallas)
    wav = modalities["audio"]["data"]
    tvars = tower.init(jax.random.PRNGKey(0), wav)

    def tower_loss(params, x):
        out, _ = tower.apply(
            {"params": params, "batch_stats": tvars.get("batch_stats", {})},
            x, train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        return jnp.sum(out * out)

    report["vjp_audio_ms"] = ms(
        lambda p, x: _allsum(jax.value_and_grad(tower_loss)(p, x)[1]),
        tvars["params"], wav)

    # ---- stem conv VJP (pallas custom vjp vs XLA framing)
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (160, 64)).astype(np.float32) * 0.05)
    bias = jnp.zeros((64,), jnp.float32)

    def stem_pallas_loss(params, x):
        y = framed_conv1d(x, params["w"], params["b"], 160, 40, 80)
        return jnp.sum(y * y)

    def stem_xla_loss(params, x):
        y = framed_matmul(x[..., None], params["w"], params["b"], 160, 40, 80)
        return jnp.sum(y * y)

    stem_params = {"w": w, "b": bias}
    if pallas:
        report["vjp_stem_pallas_ms"] = ms(
            lambda p, x: _allsum(jax.value_and_grad(stem_pallas_loss)(p, x)[1]),
            stem_params, wav)
    report["vjp_stem_xla_ms"] = ms(
        lambda p, x: _allsum(jax.value_and_grad(stem_xla_loss)(p, x)[1]),
        stem_params, wav)

    # ---- fusion + heads VJP on fixed features
    from multimodalaggressionrecognition_tpu.models.fusion import (
        EqualSizedTransformerModalitiesFusion)

    fusion = EqualSizedTransformerModalitiesFusion(1, 768, 8)
    feats = {"audio": jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch, 7, 768)).astype(np.float32)),
             "text": modalities["text"]["data"]}
    fvars = fusion.init(jax.random.PRNGKey(0), feats)

    def fusion_loss(params, f):
        out = fusion.apply({"params": params}, f)
        return sum(jnp.sum(v * v) for v in out.values())

    report["vjp_fusion_ms"] = ms(
        lambda p, f: _allsum(jax.value_and_grad(fusion_loss)(p, f)[1]),
        fvars["params"], feats)

    # ---- optimizer update alone
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])

    def opt_only(carry, g):
        params, st = carry["p"], carry["s"]
        updates, st = tx.update(g, st, params)
        return _allsum(optax.apply_updates(params, updates))

    report["opt_update_ms"] = ms(
        opt_only, {"p": variables["params"], "s": opt_state}, grads)

    # ---- full train step
    state = create_train_state(model, modalities, optax.adam(1e-3))
    step = make_train_step(model, specs, num_classes=2, donate=False)
    full_batch = {
        "modalities": modalities,
        "labels": labels,
        "label_mask": {"phys": jnp.zeros((batch,), jnp.float32),
                       "verb": mask},
        "sample_mask": mask,
    }

    def train_many(st, b):
        def body(i, carry):
            s, acc = carry
            s, m = step(s, b, jax.random.fold_in(rng, i))
            return s, acc + m["total_loss"]

        _, acc = jax.lax.fori_loop(0, 10, body, (st, jnp.float32(0)))
        return acc

    report["train_step_ms"] = round(_device_time(
        train_many, state, full_batch, iters=1, warmup=1, windows=3) / 10 * 1e3,
        3)
    report["train_clips_per_sec"] = round(
        batch / (report["train_step_ms"] / 1e3), 1)

    # Same step with a loop-invariant rng: isolates the per-step cost of
    # regenerating dropout random bits (threefry) from everything else.
    def train_many_const_rng(st, b):
        def body(i, carry):
            s, acc = carry
            s, m = step(s, b, rng)
            return s, acc + m["total_loss"]

        _, acc = jax.lax.fori_loop(0, 10, body, (st, jnp.float32(0)))
        return acc

    report["train_step_const_rng_ms"] = round(_device_time(
        train_many_const_rng, state, full_batch, iters=1, warmup=1,
        windows=3) / 10 * 1e3, 3)

    # Minimal params-threaded step (VJP + plain SGD, no metrics/adam/state):
    # isolates the cost of loop-CARRIED params vs the loop-invariant params
    # of the vjp_full probe (XLA can hoist weight relayouts only for the
    # latter).
    def sgd_many(params, b):
        def body(i, carry):
            p, acc = carry
            loss, grads = jax.value_and_grad(full_loss)(p, b)
            p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads)
            return p, acc + loss

        _, acc = jax.lax.fori_loop(
            0, 10, body, (params, jnp.float32(0)))
        return acc

    report["vjp_sgd_threaded_ms"] = round(_device_time(
        sgd_many, variables["params"], modalities, iters=1, warmup=1,
        windows=3) / 10 * 1e3, 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
