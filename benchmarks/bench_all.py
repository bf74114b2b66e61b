"""Full benchmark suite: the five BASELINE.md configs on the current device.

Usage: python benchmarks/bench_all.py [--train] [--out results.json]
Prints one JSON dict; bench.py (repo root) remains the single-line driver
contract and measures config 5's forward path.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=100, warmup=3):
    """Amortized steady-state timing with host-side dispatch.

    On the axon-tunneled TPU, block_until_ready is not a reliable completion
    barrier; the only trustworthy sync is a device->host readback (~130 ms
    RTT).  So: enqueue `iters` executions, read back one element of the last
    output, and amortize — the RTT bias is RTT/iters (~1.3 ms/100 its).
    Used only where the host genuinely drives the loop (streaming bench);
    compute-bound configs use `_device_time` below, which is immune to
    per-call dispatch noise.
    """
    import jax

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def _device_time(apply_fn, params, inputs, iters=100, warmup=2, windows=3,
                 nbuf=2):
    """Pure-chip steady-state seconds/iteration.

    Runs the whole iteration loop ON DEVICE in one jitted call: lax.fori_loop
    cycles over `nbuf` stacked copies of the input batch (dynamic-indexed by
    the loop counter so XLA cannot hoist the body out of the loop) and
    carries a scalar data dependency. Each window costs one dispatch + one
    scalar readback; per-call tunnel dispatch noise is eliminated. Best of
    `windows` is returned.

    apply_fn(params, tree_of_inputs) -> any pytree (first leaf accumulated).
    """
    import jax
    import jax.numpy as jnp

    # nbuf=1 is degenerate: the batch index i % 1 is constant, the body
    # becomes loop-invariant, and XLA hoists the whole forward out of the
    # loop — measured "throughput" inflates ~5x. Two distinct buffers is
    # the minimum that defeats loop-invariant code motion.
    nbuf = max(nbuf, 2)
    stacked = jax.tree.map(
        lambda a: jax.device_put(np.stack([np.asarray(a)] * nbuf)), inputs)

    @jax.jit
    def run(params, stacked, carry):
        def body(i, c):
            batch = jax.tree.map(lambda a: a[i % nbuf], stacked)
            out = apply_fn(params, batch)
            leaf = jax.tree.leaves(out)[0]
            return c + jnp.sum(leaf).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, carry)

    for w in range(warmup):
        warm = run(params, stacked, jnp.float32(w))
    float(warm)
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        got = run(params, stacked, jnp.float32(w))
        float(got)  # readback = completion barrier
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# v5e peak MXU throughput (bf16 — f32 matmuls execute as bf16 passes at
# default precision).  MFU here = cost_analysis() FLOPs / elapsed / peak:
# an *upper bound* on utilization pressure (cost_analysis counts algebraic
# flops, not padded-lane work), making "near roofline" checkable.
PEAK_FLOPS = 197e12
# v5e HBM bandwidth.  hbm_pct = cost_analysis() bytes / elapsed / peak: the
# byte count sums each fusion's external operands+outputs, i.e. an estimate
# of required HBM traffic (VMEM-resident reuse inside a fusion is not
# counted; buffers read by MULTIPLE fusions are double-counted, so rows can
# exceed 100% without being at any roofline — treat hbm_pct as an UPPER
# bound on bandwidth pressure; XLA may also elide buffers the estimate
# keeps).  Together with mfu_pct this names the roofline each config sits
# against: a row with low MFU but high hbm_pct is bandwidth-bound — the
# remaining lever is layout/fusion/precision, not more MXU work.
PEAK_HBM_BYTES = 819e9
# measured-achievable HBM bandwidth on this v5e (benchmarks/
# measure_hbm_bw.py: carry-dependent triad, 85.3% of paper peak) — the
# calibrated denominator for hbm_pct_of_measured
MEASURED_HBM_BYTES = 698.5e9


def _flops_of(apply_fn, params, inputs):
    """(FLOPs, bytes accessed) from the compiled executable's cost analysis."""
    import jax

    try:
        cost = jax.jit(apply_fn).lower(params, inputs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def _with_mfu(row, cost, dt):
    flops, nbytes = cost if isinstance(cost, tuple) else (cost, 0.0)
    if flops > 0 and dt > 0:
        row["gflops_fwd"] = round(flops / 1e9, 1)
        row["mfu_pct"] = round(100.0 * flops / dt / PEAK_FLOPS, 2)
    if nbytes > 0 and dt > 0:
        row["gbytes_fwd"] = round(nbytes / 1e9, 2)
        row["hbm_pct"] = round(100.0 * nbytes / dt / PEAK_HBM_BYTES, 1)
        row["hbm_pct_of_measured"] = round(
            100.0 * nbytes / dt / MEASURED_HBM_BYTES, 1)
        if row["hbm_pct"] > 100.0:
            row["hbm_note"] = (
                "cost-model overcount: cost_analysis 'bytes accessed' sums "
                "each fusion's external operands, double-counting buffers "
                "read by multiple fusions, so >100% is not physics; treat "
                "hbm_pct as an UPPER bound on bandwidth pressure "
                "(hbm_bw_measured calibrates the achievable denominator)")
    return row


def _torch_baseline(config_name, timeout=1800):
    """clips/s of the torch-CPU reference equivalent (clean subprocess,
    benchmarks/torch_baselines.py); None if it cannot run."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "torch_baselines.py")
    try:
        proc = subprocess.run([sys.executable, script, config_name],
                              capture_output=True, text=True, timeout=timeout)
        if proc.returncode != 0:
            return None
        return float(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def bench_audio_rnn(batch=16, seconds=10, compute_dtype=None):
    """Config 1: wav -> wav2vec-1-style conv encoder -> GRU head.

    The conv trunk holds (B, L/5, 512)-shaped activations (~1 GB f32 at
    these shapes) through GroupNorm+ReLU at every stage — HBM-bandwidth
    territory, so the bf16 variant is a real lever here (unlike the
    flagship's small-channel trunk)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.heads import (
        FeatureSequenceProcessing, MultiHeadModel)
    from multimodalaggressionrecognition_tpu.models.wav2vec import Wav2Vec1ConvEncoder
    from multimodalaggressionrecognition_tpu.utils.precision import cast_floating

    model = MultiHeadModel(
        heads={"GRU_1_layer": FeatureSequenceProcessing(2, 512, "gru")},
        extractor=Wav2Vec1ConvEncoder())
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 16000 * seconds)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), x)
    if compute_dtype:
        variables = dict(variables,
                         params=cast_floating(variables["params"],
                                              compute_dtype))
        x = cast_floating(x, compute_dtype)
    dt = _device_time(lambda v, xx: model.apply(v, xx), variables, x)
    row = _with_mfu({"clips_per_sec": batch / dt, "batch": batch},
                    _flops_of(lambda v, xx: model.apply(v, xx), variables, x),
                    dt)
    if not compute_dtype:
        base = _torch_baseline("config1")
        if base:
            row["torch_cpu_clips_per_sec"] = round(base, 2)
            row["vs_baseline"] = round(row["clips_per_sec"] / base, 1)
    return row


def bench_wav2vec2_extractors(seconds=10):
    """Frozen wav2vec2/HuBERT transformer extractors as on-device towers.

    The reference's live audio-extractor option for the multimodal model is
    a torchaudio bundle consumed via `extract_features(x)[0][-1]` (reference
    models.py:188-193), configured up to HUBERT-XL (reference
    train_multimodal.py:176).  This row measures those extractors (base /
    large / xlarge presets, models/wav2vec.py) as the rebuild runs them:
    one batched forward per clip window, frozen weights.  base carries a
    torch-CPU baseline; the large/xlarge rows use bf16 weights (the frozen-
    extractor serving mode — halves HBM residency; ~1 GB / 1.9 GB params).
    """
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.wav2vec import (
        HUBERT_LARGE, HUBERT_XLARGE, WAV2VEC2_BASE, Wav2Vec2Model)
    from multimodalaggressionrecognition_tpu.utils.precision import cast_floating

    from multimodalaggressionrecognition_tpu.utils.quantize import (
        dequantize_params, quantize_params, split_w8a8)

    rng = np.random.default_rng(0)
    results = {}
    for name, cfg, batch, dtype in (
            ("wav2vec2_base", WAV2VEC2_BASE, 16, None),
            ("hubert_large", HUBERT_LARGE, 8, "bfloat16"),
            # the transformer stack is matmul-bound at d=1024+: the int8 MXU
            # path (2x bf16 MACs on v5e) is the serving lever to measure
            ("hubert_large_w8a8", HUBERT_LARGE, 8, "w8a8"),
            ("hubert_xlarge", HUBERT_XLARGE, 4, "bfloat16"),
            ("hubert_xlarge_w8a8", HUBERT_XLARGE, 4, "w8a8")):
        model = Wav2Vec2Model(cfg)
        x = jnp.asarray(rng.standard_normal(
            (batch, 16000 * seconds)).astype(np.float32) * 0.1)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        apply_fn = lambda v, xx: model.apply(v, xx)
        xs = x
        if dtype == "w8a8":
            p, qs = split_w8a8(quantize_params(variables["params"]))
            variables = jax.tree.map(jax.device_put,
                                     dict(variables, params=p, quant=qs))
            apply_fn = lambda v, xx: model.apply(
                dict(v, params=dequantize_params(v["params"])), xx)
        elif dtype:
            variables = dict(variables,
                             params=cast_floating(variables["params"], dtype))
            xs = cast_floating(x, dtype)
        n_params = sum(int(np.prod(a.shape))
                       for a in jax.tree.leaves(variables["params"])
                       if hasattr(a, "shape"))
        dt = _device_time(apply_fn, variables, xs)
        row = _with_mfu({"clips_per_sec": round(batch / dt, 1),
                         "batch": batch, "params_m": round(n_params / 1e6, 1)},
                        _flops_of(apply_fn, variables, xs), dt)
        if dtype:
            row["weights"] = dtype
        results[name] = row
        del variables
    base = _torch_baseline("config_w2v2")
    if base:
        results["torch_cpu_clips_per_sec_base_row"] = round(base, 2)
        results["vs_baseline"] = round(
            results["wav2vec2_base"]["clips_per_sec"] / base, 1)
    return results


def bench_video_3dcnn(batch=8, frames=16, size=112, compute_dtype=None):
    """Config 2: 16-frame 112px clip -> 3D-CNN classifier."""
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.r3d import R3DWithBboxes
    from multimodalaggressionrecognition_tpu.utils.precision import cast_floating

    model = R3DWithBboxes(class_num=4)
    rng = np.random.default_rng(0)
    frames_x = jnp.asarray(rng.standard_normal(
        (batch, frames, size, size, 3)).astype(np.float32) * 0.3)
    mask = jnp.asarray((rng.uniform(0, 1, (batch, frames, size, size, 1)) > 0.5)
                       .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames_x, mask)
    if compute_dtype:  # bf16 weights/activations; keep BN stats f32
        variables = dict(variables,
                         params=cast_floating(variables["params"],
                                              compute_dtype))
    inputs = cast_floating({"f": frames_x, "m": mask}, compute_dtype)
    dt = _device_time(lambda v, b: model.apply(v, b["f"], b["m"]),
                      variables, inputs)
    row = _with_mfu({"clips_per_sec": batch / dt, "batch": batch},
                    _flops_of(lambda v, b: model.apply(v, b["f"], b["m"]),
                              variables, inputs), dt)
    if not compute_dtype:
        base = _torch_baseline("config2")
        if base:
            row["torch_cpu_clips_per_sec"] = round(base, 2)
            row["vs_baseline"] = round(row["clips_per_sec"] / base, 1)
    return row


def bench_feature_transformers(batch=32):
    """Config 3: precomputed-feature audio + video transformer heads."""
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.heads import (
        TransformerSequenceClassifier)

    results = {}
    for name, (t, d) in (("audio", (49, 768)), ("video", (16, 768))):
        model = TransformerSequenceClassifier(class_num=2, hidden_size=d,
                                              num_layers=2, num_heads=8)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, t, d)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        dt = _device_time(lambda v, xx: model.apply(v, xx), variables, x)
        results[name] = _with_mfu(
            {"clips_per_sec": batch / dt, "batch": batch},
            _flops_of(lambda v, xx: model.apply(v, xx), variables, x), dt)
    base = _torch_baseline("config3")  # slower torch row (49x768)
    if base:
        slow = min(r["clips_per_sec"] for r in results.values())
        results["torch_cpu_clips_per_sec_slow_row"] = round(base, 2)
        results["vs_baseline"] = round(slow / base, 1)
    return results


def bench_audio_text(batch=32):
    """Config 4: CNN1D audio tower + transformer text tower."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from multimodalaggressionrecognition_tpu.models.audiotext import AudioTextualModel
    from multimodalaggressionrecognition_tpu.models.cnn1d import (
        AudioCnn1DExtractorWrapper)
    from multimodalaggressionrecognition_tpu.models.heads import (
        TransformerSequenceClassifier)

    class TextFeatures(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, x, train=False):
            return self.inner(x, train=train, return_type="features")

    pallas = jax.default_backend() == "tpu"
    model = AudioTextualModel(
        audio_extractor=AudioCnn1DExtractorWrapper(768, pallas_stem=pallas),
        text_extractor=TextFeatures(TransformerSequenceClassifier(
            class_num=2, hidden_size=768, num_layers=2, num_heads=8)),
        hidden_size=768, class_num=2)
    rng = np.random.default_rng(0)
    batch_dict = {
        "audio": {"data": jnp.asarray(rng.standard_normal(
            (batch, 80000)).astype(np.float32) * 0.1)},
        "text": {"data": jnp.asarray(rng.standard_normal(
            (batch, 48, 768)).astype(np.float32))},
    }
    variables = model.init(jax.random.PRNGKey(0), batch_dict)
    dt = _device_time(lambda v, b: model.apply(v, b), variables, batch_dict)
    row = _with_mfu({"clips_per_sec": batch / dt, "batch": batch},
                    _flops_of(lambda v, b: model.apply(v, b), variables,
                              batch_dict), dt)
    base = _torch_baseline("config4")
    if base:
        row["torch_cpu_clips_per_sec"] = round(base, 2)
        row["vs_baseline"] = round(row["clips_per_sec"] / base, 1)
    return row


def bench_multimodal(batch=32, train=False, compute_dtype=None,
                     quantize=None):
    """Config 5: full multimodal late fusion, forward and train step.

    compute_dtype='bfloat16' measures the mixed-precision path: bf16
    weights/activations at inference, bf16 compute + f32 master state in
    the train step (utils/precision.py).  quantize='int8' measures the
    weight-only int8 serving path (kernels stored int8 in HBM, dequantized
    on device — utils/quantize.py)."""
    import jax
    import optax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import create_train_state
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step
    from multimodalaggressionrecognition_tpu.utils.precision import cast_floating

    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)
    modalities = jax.tree.map(jax.device_put, _batch(batch, 80000, 48, 768))
    variables = model.init(jax.random.PRNGKey(0), modalities)
    fwd_vars = variables
    if compute_dtype:  # bf16 weights/activations; keep BN stats f32
        fwd_vars = dict(variables,
                        params=cast_floating(variables["params"],
                                             compute_dtype))
    fwd_mods = cast_floating(modalities, compute_dtype)
    if quantize in ("int8", "w8a8"):
        from multimodalaggressionrecognition_tpu.utils.quantize import (
            dequantize_params, quantize_params, split_w8a8)

        qp = quantize_params(fwd_vars["params"])
        if quantize == "w8a8":
            # int8 MXU path: matmul kernels stay int8 end-to-end,
            # activations dynamically quantized per token (split_w8a8);
            # non-matmul kernels keep the weight-only marker dicts that
            # dequantize_params resolves below.
            qp, qscales = split_w8a8(qp)
            fwd_vars = dict(fwd_vars, quant=qscales)
        fwd_vars = jax.tree.map(jax.device_put, dict(fwd_vars, params=qp))
        dt = _device_time(
            lambda v, b: model.apply(
                dict(v, params=dequantize_params(v["params"])), b),
            fwd_vars, fwd_mods)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    else:
        dt = _device_time(lambda v, b: model.apply(v, b), fwd_vars, fwd_mods)
    out = _with_mfu({"fwd_clips_per_sec": batch / dt, "batch": batch},
                    _flops_of(lambda v, b: model.apply(v, b), fwd_vars,
                              fwd_mods), dt)

    if train:
        full_batch = jax.tree.map(jax.device_put, {
            "modalities": modalities,
            "labels": {"phys": np.zeros((batch,), np.int32),
                       "verb": (np.arange(batch) % 2).astype(np.int32)},
            "label_mask": {"phys": np.zeros((batch,), np.float32),
                           "verb": np.ones((batch,), np.float32)},
            "sample_mask": np.ones((batch,), np.float32),
        })
        state = create_train_state(model, modalities, optax.adam(1e-3))
        step = make_train_step(
            model, {"phys": LossSpec("focal", class_weights=(0.5, 0.5)),
                    "verb": LossSpec("ce")}, num_classes=2, donate=False,
            compute_dtype=compute_dtype)
        rng_key = jax.random.PRNGKey(0)

        # Sustained training throughput: thread the optimizer state through
        # an on-device loop (the realistic steady state — each step consumes
        # the previous step's state), data-dependent on the running loss.
        def train_many(st, batch_):
            def body(i, carry):
                s, acc = carry
                s, metrics = step(s, batch_, jax.random.fold_in(rng_key, i))
                return s, acc + metrics["total_loss"]

            import jax.numpy as jnp
            _, acc = jax.lax.fori_loop(0, 20, body, (st, jnp.float32(0)))
            return acc

        dt = _device_time(train_many, state, full_batch,
                          iters=1, warmup=1, windows=3)
        out["train_clips_per_sec"] = batch * 20 / dt
    return out


def bench_trimodal(batch=8, frames=128, size=112, window=8,
                   compute_dtype=None, gelu="poly", train=False,
                   freeze_video=True, video_remat=True):
    """Config 7 (beyond reference practice): the FULL tri-modal flagship —
    online frozen Swin3D-T windowed video extraction + CNN1D audio tower +
    text + fusion + heads, one jitted forward.  The reference could only run
    this configuration by pre-extracting video features to disk for hundreds
    of pseudo-epochs (reference extract_video_features.py:100-112,
    train_multimodal.py:335); here the frozen backbone runs inline on the
    same chip."""
    import jax

    from __graft_entry__ import _batch
    from multimodalaggressionrecognition_tpu.cli.train_multimodal import (
        MultimodalConfig, build_model)
    from multimodalaggressionrecognition_tpu.utils.precision import cast_floating

    cfg = MultimodalConfig(video_frames=frames, video_size=size,
                           video_window=window, swin_gelu=gelu,
                           video_freeze=freeze_video,
                           video_remat=video_remat)
    model = build_model(cfg, ("audio", "text", "video"))
    rng = np.random.default_rng(0)
    modalities = _batch(batch, 80000, 48, 768)
    modalities["video"] = {
        "data": rng.standard_normal(
            (batch, frames, size, size, 3)).astype(np.float32) * 0.3,
        "present": np.ones((batch,), np.float32)}
    modalities = jax.tree.map(jax.device_put, modalities)
    if not train:
        # the train branch initializes via create_train_state (jitted init)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), modalities)
    if compute_dtype:
        if not train:
            variables = dict(variables,
                             params=cast_floating(variables["params"],
                                                  compute_dtype))
        modalities = cast_floating(modalities, compute_dtype)
    if train:
        # the reference's actual regime: frozen Swin (stop_gradient inside
        # WindowedVideoExtractor), trainable audio/text towers + fusion +
        # heads, one value_and_grad + adam per step
        import optax

        from multimodalaggressionrecognition_tpu.train import LossSpec
        from multimodalaggressionrecognition_tpu.train.state import (
            create_train_state)
        from multimodalaggressionrecognition_tpu.train.steps import (
            make_train_step)

        full_batch = jax.tree.map(jax.device_put, {
            "modalities": modalities,
            "labels": {"phys": np.zeros((batch,), np.int32),
                       "verb": (np.arange(batch) % 2).astype(np.int32)},
            "label_mask": {"phys": np.ones((batch,), np.float32),
                           "verb": np.ones((batch,), np.float32)},
            "sample_mask": np.ones((batch,), np.float32),
        })
        state = create_train_state(model, modalities, optax.adam(1e-3))
        step = make_train_step(
            model, {"phys": LossSpec("ce"), "verb": LossSpec("ce")},
            num_classes=2, donate=True, compute_dtype=compute_dtype)

        # PRODUCTION methodology (host loop, donated state): the previous
        # on-device fori_loop copied the whole loop-carried TrainState every
        # iteration — negligible for the frozen row's small trainable set
        # but ~4x the step time when the 28M-param Swin tower is unfrozen
        # (the remat sweep's raw backward is 43 ms/step while the fori_loop
        # row read 174 ms).  Host-dispatched donated steps consume the
        # previous buffers in place; async enqueue pipelines dispatch under
        # compute, and the final readback is the completion barrier.
        steps_n = 20  # amortizes the one ~130 ms tunnel readback per window
        keys = list(jax.random.split(jax.random.PRNGKey(0), 2 + 3 * steps_n))
        for i in range(2):  # compile + settle
            state, metrics = step(state, full_batch, keys[i])
        float(metrics["total_loss"])
        best = float("inf")
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(steps_n):
                state, metrics = step(state, full_batch,
                                      keys[2 + w * steps_n + i])
            float(metrics["total_loss"])  # completion barrier
            best = min(best, (time.perf_counter() - t0) / steps_n)
        return {"train_clips_per_sec": batch / best, "batch": batch,
                "frames": frames, "window": window,
                "methodology": "host loop, donated state (production path)"}
    dt = _device_time(lambda v, b: model.apply(v, b), variables, modalities,
                      iters=20, nbuf=2)
    return _with_mfu({"clips_per_sec": batch / dt, "batch": batch,
                      "frames": frames, "window": window},
                     _flops_of(lambda v, b: model.apply(v, b), variables,
                               modalities), dt)


def bench_serving_microbatch(threads=16, seconds=5.0, batch=32,
                             max_delay_ms=2.0):
    """Online-serving coalescer measurement, split into its two real costs
    (through the axon tunnel a naive closed-loop run only measures the
    ~130 ms per-dispatch readback RTT, which says nothing about serving):

    1. device_group_ms — the amortized ON-DEVICE cost of one coalesced
       full-batch dispatch, measured with the same enqueue-N protocol as
       every other row (no per-dispatch readback in the number);
    2. queueing behavior of serve.MicroBatcher under `threads` concurrent
       closed-loop clients, with the scorer's device time *simulated* as a
       sleep of exactly device_group_ms: p50/p99 then measure group
       formation + compute as co-located serving would see them, with the
       tunnel RTT removed instead of dominating.

    mean_group_size is the achieved coalescing factor; clips_per_sec is the
    simulated sustained rate (formation overlapped with compute)."""
    import threading as th

    import jax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.serve import MicroBatcher, Predictor

    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)
    host = _batch(batch, 80000, 48, 768)
    variables = model.init(jax.random.PRNGKey(0), host)
    predictor = Predictor(model, variables, batch_size=batch)
    predictor.warmup({"audio": host["audio"]["data"][:1],
                      "text": host["text"]["data"][:1]})

    # (1) amortized device cost of one full coalesced group
    padded = predictor._pad_batch({"audio": np.asarray(host["audio"]["data"]),
                                   "text": np.asarray(host["text"]["data"])},
                                  batch)
    device_s = _device_time(lambda v, b: predictor._forward(v, b),
                            predictor.variables, padded, iters=50)

    # (2) MicroBatcher under load with the device cost simulated
    class SimScorer:
        """Predictor stand-in: same compiled-batch contract, scoring cost
        = the measured amortized device time for one group."""
        batch_size = batch
        modalities = ("audio", "text")

        def __init__(self):
            self.dispatches = 0

        def predict(self, modalities, return_probs=True):
            n = next(iter(modalities.values())).shape[0]
            self.dispatches += 1
            time.sleep(device_s)
            return {h: np.zeros((n, 2), np.float32) for h in ("phys", "verb")}

    sim = SimScorer()
    batcher = MicroBatcher(sim, max_delay_ms=max_delay_ms)
    latencies, errors, lock = [], [], th.Lock()
    stop = th.Event()

    def client(seed):
        rng = np.random.default_rng(seed)
        audio = rng.standard_normal((1, 80000)).astype(np.float32) * 0.1
        text = rng.standard_normal((1, 48, 768)).astype(np.float32)
        local = []
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                batcher.submit({"audio": audio, "text": text}).result()
            except Exception as e:  # surface the scoring error, don't die silently
                with lock:
                    errors.append(e)
                break
            local.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(local)

    workers = [th.Thread(target=client, args=(i,)) for i in range(threads)]
    t0 = time.perf_counter()
    for w in workers:
        w.start()
    time.sleep(seconds)
    stop.set()
    for w in workers:
        w.join()
    elapsed = time.perf_counter() - t0
    batcher.close()
    if errors or not latencies:
        raise RuntimeError(
            f"serving bench: {len(errors)} client error(s), "
            f"{len(latencies)} completed requests"
        ) from (errors[0] if errors else None)
    lat = np.sort(np.array(latencies)) * 1e3
    return {
        "clips_per_sec": round(len(lat) / elapsed, 1),
        "concurrent_clients": threads,
        "device_group_ms": round(device_s * 1e3, 3),
        "p50_ms": round(float(lat[len(lat) // 2]), 2),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]), 2),
        "mean_group_size": round(len(lat) / max(sim.dispatches, 1), 2),
        "max_delay_ms": max_delay_ms,
        "note": ("device_group_ms is the real amortized on-device cost of "
                 "one coalesced dispatch (enqueue-N protocol); the latency "
                 "percentiles come from driving serve.MicroBatcher with "
                 "that cost simulated, i.e. group formation + compute "
                 "WITHOUT the axon tunnel's ~130 ms per-dispatch RTT"),
    }


def bench_exported_artifact(batch=32, iters=30):
    """AOT deployment artifact (io/export.py) vs the live Predictor on the
    flagship: the artifact is the same XLA program with weights baked in as
    StableHLO constants, so its throughput should match the live XLA path —
    this row makes that checkable and records the artifact size.  Timed
    through the host predict() API (per-call dispatch + full readback
    included — through the axon tunnel both paths pay the same ~130 ms RTT,
    so compare the two numbers to each other, not to the on-device rows).
    The live predictor keeps its production kernel selection (Pallas stem
    on TPU); the default artifact carries the portable XLA lowering, and
    on TPU a second row measures the --native artifact (Pallas kernels
    kept), which should recover the live throughput."""
    import tempfile

    import jax

    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.io.export import (
        ExportedPredictor, export_predictor)
    from multimodalaggressionrecognition_tpu.serve import Predictor

    # AUTO kernel selection (pallas_stem=None): the live predictor traces
    # the Pallas stem on TPU, while export_predictor's force_xla() traces
    # the portable XLA lowering — an EXPLICIT pallas_stem=True would make
    # jax.export raise on the Mosaic custom call (utils/kernels.py)
    model = _flagship(pallas_stem=None)
    host = _batch(batch, 80000, 48, 768)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), host)
    pred = Predictor(model, variables, batch_size=batch)
    example = {"audio": np.zeros((1, 80000), np.float32),
               "text": np.zeros((1, 48, 768), np.float32)}
    pred.warmup(example)

    rng = np.random.default_rng(0)
    req = {"audio": rng.standard_normal((batch, 80000)).astype(np.float32)
           * 0.1,
           "text": rng.standard_normal((batch, 48, 768)).astype(np.float32)}

    def throughput(p):
        p.predict(req)  # compile/warm outside the timed loop
        t0 = time.perf_counter()
        for _ in range(iters):
            out = p.predict(req)
        return batch * iters / (time.perf_counter() - t0), out

    with tempfile.TemporaryDirectory() as d:
        export_predictor(pred, example, d)
        size = os.path.getsize(os.path.join(d, "model.jaxexport"))
        exported = ExportedPredictor(d).warmup()
        live_cps, live_out = throughput(pred)
        art_cps, art_out = throughput(exported)
    max_dev = max(float(np.abs(live_out[h] - art_out[h]).max())
                  for h in live_out)
    out = {
        "live_clips_per_sec": round(live_cps, 1),
        "artifact_clips_per_sec": round(art_cps, 1),
        "artifact_mb": round(size / 1e6, 1),
        "max_score_dev_vs_live": round(max_dev, 6),
        "note": ("host predict() API timing incl. per-call dispatch/"
                 "readback; live path uses production kernels (Pallas stem "
                 "on TPU), artifact is the portable XLA lowering"),
    }
    if jax.default_backend() == "tpu":
        # TPU-native artifact (export_model --native): keeps the Pallas
        # kernels, so it should match the live predictor's throughput
        with tempfile.TemporaryDirectory() as d:
            export_predictor(pred, example, d, platforms=("tpu",),
                             native=True)
            native = ExportedPredictor(d).warmup()
            nat_cps, nat_out = throughput(native)
        out["native_artifact_clips_per_sec"] = round(nat_cps, 1)
        out["native_max_score_dev_vs_live"] = round(
            max(float(np.abs(live_out[h] - nat_out[h]).max())
                for h in live_out), 6)

    # w8a8 deployment artifact: int8 weights baked into the program (the
    # quantize path of cli/export_model) — the density/deployment unit for
    # the int8 MXU path.  Size should drop ~4x; scores within the
    # w8a8 tolerance (tests/test_quantize.py asserts argmax parity).
    qpred = Predictor(model, variables, batch_size=batch, quantize="w8a8")
    qpred.warmup(example)
    with tempfile.TemporaryDirectory() as d:
        export_predictor(qpred, example, d)
        qsize = os.path.getsize(os.path.join(d, "model.jaxexport"))
        qexported = ExportedPredictor(d).warmup()
        q_cps, q_out = throughput(qexported)
    out["w8a8_artifact_clips_per_sec"] = round(q_cps, 1)
    out["w8a8_artifact_mb"] = round(qsize / 1e6, 1)
    out["w8a8_max_score_dev_vs_live"] = round(
        max(float(np.abs(live_out[h] - q_out[h]).max()) for h in live_out), 6)
    return out


def bench_streaming_e2e(n_clips=256, batch=32):
    """North-star pipeline: host wav decode -> resample/pad -> background
    device prefetch -> multimodal logits, overlapped (BASELINE.md metric:
    end-to-end decode->features->logits clips/sec)."""
    import tempfile

    import jax

    from __graft_entry__ import _flagship
    from multimodalaggressionrecognition_tpu.data.files import (
        FilenameLabelSource, RandomBatchSampler)
    from multimodalaggressionrecognition_tpu.data.pipeline import (
        BatchLoader, device_prefetch)
    from multimodalaggressionrecognition_tpu.data.transforms import pad_audio

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_input_pipeline import make_wavs

    rng = np.random.default_rng(0)
    pallas = jax.default_backend() == "tpu"
    model = _flagship(pallas_stem=pallas)

    with tempfile.TemporaryDirectory() as root:
        make_wavs(root, n=n_clips, seconds=5, rate=44100)
        src = FilenameLabelSource(root, "audio", transform=pad_audio(80000))
        text_block = rng.standard_normal((batch, 48, 768)).astype(np.float32)

        def batches():
            sampler = RandomBatchSampler(len(src), batch, shuffle=False)
            for b in BatchLoader(src, sampler, pad_to=batch, num_threads=8):
                b["modalities"]["text"] = {
                    "data": text_block,
                    "present": np.ones((batch,), np.float32)}
                yield b

        first = next(batches())
        variables = model.init(jax.random.PRNGKey(0), first["modalities"])
        fwd = jax.jit(lambda v, m: model.apply(v, m))
        out = fwd(variables, jax.tree.map(jax.device_put, first["modalities"]))
        np.asarray(out["verb"][0, 0])  # compile + sync

        t0 = time.perf_counter()
        count = 0
        for b in device_prefetch(batches(), prefetch=4):
            out = fwd(variables, b["modalities"])
            count += batch
        np.asarray(out["verb"][0, 0])
        dt = time.perf_counter() - t0
        return {"clips_per_sec": round(count / dt, 1), "clips": count,
                "note": ("on the axon-tunneled dev rig this is bounded by "
                         "~35MB/s host->device transfer, not decode or "
                         "compute; co-located hosts upload over PCIe")}


def bench_streaming_video_e2e(n_clips=64, batch=8, frames=32, size=112):
    """Streaming VIDEO pipeline (VERDICT r2 item 8): mp4 files -> threaded
    cv2 decode+resize on host -> background device prefetch -> online
    windowed Swin3D features, overlapped.  Reports the decode-only,
    compute-only, and overlapped end-to-end rates so the decode/H2D/compute
    split is explicit (the reference's nearest equivalent decoded mp4s
    offline to .npy dumps, reference prepare_numpy_data.py:15-35)."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from multimodalaggressionrecognition_tpu.data.pipeline import (
        device_prefetch)
    from multimodalaggressionrecognition_tpu.data.video_clips import (
        read_video_cv2)
    from multimodalaggressionrecognition_tpu.models.swin3d import (
        Swin3dTExtractor)
    from multimodalaggressionrecognition_tpu.models.video_extractors import (
        WindowedVideoExtractor)

    try:
        import cv2
    except ImportError:
        return {"skipped": "cv2 unavailable"}

    rng = np.random.default_rng(0)
    model = WindowedVideoExtractor(Swin3dTExtractor(), window=8)

    with tempfile.TemporaryDirectory() as root:
        paths = []
        for i in range(n_clips):
            clip = (rng.uniform(0, 255, (frames, 128, 160, 3))
                    .astype(np.uint8))
            path = os.path.join(root, f"clip{i:03d}.mp4")
            writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                     10.0, (160, 128))
            for f in clip:
                writer.write(f[..., ::-1])
            writer.release()
            paths.append(path)

        def decode_one(path):
            vid = read_video_cv2(path)[:frames]
            out = np.stack([cv2.resize(f, (size, size)) for f in vid])
            if out.shape[0] < frames:
                out = np.concatenate(
                    [out, np.zeros((frames - out.shape[0], size, size, 3),
                                   np.float32)])
            return out

        # decode-thread scaling curve (VERDICT r4 weak #5b): 1/2/4/8 host
        # threads for the cv2 path; on a 1-core rig the curve is expected
        # flat — the single-thread point is the per-core rate the co-located
        # estimate scales from
        cv2_curve = {}
        for t in (1, 2, 4, 8):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(t) as pool:
                clips = list(pool.map(decode_one, paths))
            cv2_curve[t] = round(n_clips / (time.perf_counter() - t0), 1)
        decode_rate = cv2_curve[8]

        # native decoder (libmarvideo.so: FFmpeg decode + fused resize +
        # batch assembly, no GIL): preferred path when built; same curve
        native_rate = None
        native_curve = {}
        from multimodalaggressionrecognition_tpu.data import native
        if native.video_available():
            native.video_batch(paths[:batch], frames, size, 8)  # warm
            for t in (1, 2, 4, 8):
                t0 = time.perf_counter()
                nclips = native.video_batch(paths, frames, size, t)
                native_curve[t] = round(
                    n_clips / (time.perf_counter() - t0), 1)
            native_rate = native_curve[8]

            def decode_block(lo):
                return native.video_batch(
                    paths[lo:lo + batch], frames, size,
                    8).astype(np.float32) / np.float32(255.0)
        else:
            def decode_block(lo):
                return np.stack([decode_one(p)
                                 for p in paths[lo:lo + batch]])

        x0 = jax.device_put(np.stack(clips[:batch]))
        variables = model.init(jax.random.PRNGKey(0), x0)
        fwd = jax.jit(lambda v, xx: model.apply(v, xx))
        np.asarray(fwd(variables, x0))[0, 0]  # compile + sync
        compute_dt = _device_time(lambda v, xx: fwd(v, xx), variables,
                                  np.stack(clips[:batch]), iters=5, nbuf=2)
        compute_rate = batch / compute_dt

        def batches():
            # native decode threads internally (8 FFmpeg workers, no GIL)
            # so one block in flight suffices; the cv2 fallback decodes
            # sequentially within a block, so it overlaps blocks instead
            with ThreadPoolExecutor(1 if native_rate is not None
                                    else 8) as pool:
                futs = [pool.submit(decode_block, lo)
                        for lo in range(0, n_clips, batch)]
                for f in futs:
                    b = f.result()
                    if b.shape[0] == batch:
                        yield b

        t0 = time.perf_counter()
        count = 0
        for b in device_prefetch(batches(), prefetch=3):
            out = fwd(variables, b)
            count += batch
        np.asarray(out)[0, 0]
        e2e_rate = count / (time.perf_counter() - t0)

        # tunnel-free overlap (VERDICT r4 weak #5a): the device crunches
        # pre-staged buffers in ONE dispatch (fori_loop, nbuf=2 distinct
        # batches so nothing is loop-invariant) WHILE the host decodes the
        # whole clip set — the H2D leg and per-call dispatch RTT are out of
        # the measured path.  Wall ~ max(decode, compute) iff the overlap
        # machinery holds both sides busy.
        import jax.numpy as jnp

        iters = max(2, n_clips // batch)
        staged = jax.device_put(np.stack(
            [np.stack(clips[:batch]), np.stack(clips[batch:2 * batch])]))

        @jax.jit
        def run(v, xs, c):
            def body(i, c):
                out = model.apply(v, xs[i % 2])
                return c + jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, c)

        float(np.asarray(run(variables, staged, jnp.float32(0))))  # compile
        if native_rate is not None:
            def host_decode_all():
                native.video_batch(paths, frames, size, 8)
        else:
            def host_decode_all():
                with ThreadPoolExecutor(8) as pool:
                    list(pool.map(decode_one, paths))
        t0 = time.perf_counter()
        acc = run(variables, staged, jnp.float32(1))  # async dispatch
        host_decode_all()
        t_decode = time.perf_counter() - t0
        float(np.asarray(acc))  # readback = completion barrier
        t_both = time.perf_counter() - t0
        overlap_rate = min(iters * batch, n_clips) / t_both

        # co-located estimate (VERDICT r4 weak #5): on a production host the
        # pipeline rate is min(decode, H2D, compute).  Decode is modeled as
        # 8 cores x the measured single-thread rate of the best decoder
        # (this rig has 1 core, so the measured 8-thread point IS the
        # single-thread rate); H2D is modeled at PCIe gen3 x16 effective
        # 10 GB/s on the f32 clip blocks the pipeline uploads.
        per_core = max(native_curve.get(1, 0.0), cv2_curve[1])
        bytes_per_clip = 4.0 * frames * size * size * 3
        h2d_clips = 10e9 / bytes_per_clip
        colocated = min(8 * per_core, h2d_clips, compute_rate)

        result = {"clips_per_sec": round(e2e_rate, 1), "clips": count,
                  "decode_only_clips_per_sec": round(decode_rate, 1),
                  "compute_only_clips_per_sec": round(compute_rate, 1),
                  "frames": frames,
                  "decode_thread_scaling_cv2": cv2_curve,
                  "overlap_tunnel_free_clips_per_sec": round(overlap_rate, 1),
                  "overlap_decode_done_at_sec": round(t_decode, 2),
                  "overlap_both_done_at_sec": round(t_both, 2),
                  "colocated_estimate_clips_per_sec": round(colocated, 1),
                  "colocated_model": (
                      f"min(8 cores x {per_core:.1f} single-thread decode "
                      f"clips/s = {8 * per_core:.0f}, PCIe gen3 H2D at "
                      f"10 GB/s / {bytes_per_clip / 1e6:.1f} MB f32 per clip "
                      f"= {h2d_clips:.0f}, compute {compute_rate:.0f})"),
                  "note": ("mp4 -> threaded decode -> prefetch -> online "
                           "windowed Swin3D features; on the axon tunnel the "
                           "H2D leg (~35MB/s) bounds the overlapped "
                           "clips_per_sec row — overlap_tunnel_free and "
                           "colocated_estimate are the deployable numbers")}
        if native_rate is not None:
            result["native_decode_clips_per_sec"] = round(native_rate, 1)
            result["decode_thread_scaling_native"] = native_curve
        return result


def main():
    import jax

    from multimodalaggressionrecognition_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR)

    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--out", default="")
    p.add_argument("--only", default="",
                   help="comma-separated result keys to (re)run; other rows "
                        "are kept from --merge_from if given")
    p.add_argument("--merge_from", default="",
                   help="existing results json to merge freshly-run rows "
                        "into (stale rows preserved)")
    p.add_argument("--compile_cache",
                   default=os.path.expanduser(DEFAULT_CACHE_DIR),
                   help="persistent XLA compile cache dir ('' = off); "
                        "repeat runs skip the minutes-long Pallas/axon "
                        "remote compiles")
    args = p.parse_args()

    if args.compile_cache:
        from multimodalaggressionrecognition_tpu.utils.compile_cache import (
            enable_compilation_cache)

        enable_compilation_cache(args.compile_cache)

    results = {"device": str(jax.devices()[0])}
    if args.merge_from:
        with open(args.merge_from) as f:
            stale = json.load(f)
        stale.pop("device", None)
        stale.pop("total_seconds", None)
        results.update(stale)
    t0 = time.time()
    rows = {
        "1_audio_rnn": bench_audio_rnn,
        "1_audio_rnn_bf16": lambda: bench_audio_rnn(compute_dtype="bfloat16"),
        # the reference's torchaudio-bundle audio extractors (up to
        # HuBERT-XL) as frozen on-device towers
        "1b_wav2vec2_extractors": bench_wav2vec2_extractors,
        "2_video_3dcnn": bench_video_3dcnn,
        "2_video_3dcnn_bf16":
            lambda: bench_video_3dcnn(compute_dtype="bfloat16"),
        "3_feature_transformers": bench_feature_transformers,
        "4_audio_text": bench_audio_text,
        "5_multimodal": lambda: bench_multimodal(train=args.train),
        "5_multimodal_bf16":
            lambda: bench_multimodal(train=args.train,
                                     compute_dtype="bfloat16"),
        # p50 single-clip latency on the flagship (BASELINE.md secondary)
        "p50_clip_latency_ms_int8": lambda: round(
            1000.0 / bench_multimodal(
                batch=1, quantize="int8")["fwd_clips_per_sec"], 3),
        "p50_clip_latency_ms_w8a8": lambda: round(
            1000.0 / bench_multimodal(
                batch=1, quantize="w8a8")["fwd_clips_per_sec"], 3),
        "p50_clip_latency_ms": lambda: round(
            1000.0 / bench_multimodal(batch=1)["fwd_clips_per_sec"], 3),
        "6_streaming_decode_to_logits": bench_streaming_e2e,
        "6b_streaming_video_to_features": bench_streaming_video_e2e,
        "7_trimodal_online_swin3d": bench_trimodal,
        "7_trimodal_online_swin3d_bf16":
            lambda: bench_trimodal(compute_dtype="bfloat16"),
        # full serving stack: fused window attention + bf16 + tanh GELU
        "7_trimodal_online_swin3d_serving":
            lambda: bench_trimodal(compute_dtype="bfloat16", gelu="tanh"),
        # reference training regime: frozen online Swin + trainable towers
        "7_trimodal_train": lambda: bench_trimodal(train=True),
        # beyond-reference: fine-tune the Swin tower too (remat + Pallas
        # flash backward through the fused window attention)
        "7_trimodal_finetune_unfrozen":
            lambda: bench_trimodal(train=True, freeze_video=False),
        # bf16 fine-tune: halves activation memory and runs the flash
        # backward in bf16
        "7_trimodal_finetune_unfrozen_bf16":
            lambda: bench_trimodal(train=True, freeze_video=False,
                                   compute_dtype="bfloat16"),
        # TUNED fine-tune config from the corrected remat sweep +
        # profile_finetune_step decomposition: bf16 AND no remat (the
        # 128-window activations fit HBM, so recompute only costs time)
        "7_trimodal_finetune_unfrozen_tuned":
            lambda: bench_trimodal(train=True, freeze_video=False,
                                   compute_dtype="bfloat16",
                                   video_remat=False),
        # online serving under concurrent load (serve.MicroBatcher)
        "8_serving_microbatch": bench_serving_microbatch,
        # AOT jax.export artifact vs the live Predictor (io/export.py)
        "9_exported_artifact": bench_exported_artifact,
    }
    selected = ([k.strip() for k in args.only.split(",") if k.strip()]
                if args.only else list(rows))
    unknown = [k for k in selected if k not in rows]
    if unknown:
        raise SystemExit(f"unknown --only keys: {unknown} "
                         f"(choose from {list(rows)})")
    for key in selected:
        results[key] = rows[key]()
    results["notes"] = {
        "train": ("sustained on-device loop (state threaded through "
                  "lax.fori_loop); decomposition in profile_train.py — at "
                  "b32 the vjp+adam is ~3.2ms and the remainder is XLA "
                  "while-loop copy insertion on the loop-carried state. "
                  "The PRODUCTION path (host loop, donate=True, "
                  "profile_dispatch.py) measured 7.45k clips/s @b32 even "
                  "through the tunnel: async enqueue pipelines dispatch "
                  "under compute. Fixed overhead amortizes with batch "
                  "size (9.3k @b128)."),
        "bf16": ("compute_dtype=bfloat16 is a layout/bandwidth lever on "
                 "v5e, not an MXU lever: f32 matmuls already execute as "
                 "bf16 MXU passes at default precision. Layout-bound paths "
                 "pay off directly — video 3D-CNN +14%, swin tri-modal "
                 "+54% — while the small-channel audio trunk prefers f32 "
                 "tiles (flagship fwd f32 > bf16)."),
        "variance": ("run-to-run variance through the axon tunnel is "
                     "~10-15% on sub-ms configs; compare numbers from the "
                     "same run."),
    }
    results["total_seconds"] = round(time.time() - t0, 1)
    text = json.dumps(results, indent=2, default=str)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
