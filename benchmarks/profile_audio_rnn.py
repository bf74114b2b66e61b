"""Decompose config 1 (audio RNN, 625 clips/s r2) into conv-encoder vs
GRU-scan time and sweep the lax.scan unroll factor (VERDICT r2 item 6).

Config: batch-16 10s 16kHz wav -> Wav2Vec1ConvEncoder (5 strided convs,
512-d, T=1249... -> ~499 frames) -> single-layer GRU(512) head.  The GRU's
input projections are already hoisted out of the scan (models/rnn.py); the
question is whether the remaining sequential (B,512)x(512,1536) recurrent
matmul chain or the conv trunk dominates, and what unroll minimizes the
per-step overhead.

Usage: python benchmarks/profile_audio_rnn.py
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

    from multimodalaggressionrecognition_tpu.models.heads import (
        FeatureSequenceProcessing, MultiHeadModel)
    from multimodalaggressionrecognition_tpu.models.rnn import GRU
    from multimodalaggressionrecognition_tpu.models.wav2vec import (
        Wav2Vec1ConvEncoder)

    batch, seconds = 16, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 16000 * seconds)).astype(np.float32) * 0.1)
    report = {"device": str(jax.devices()[0]), "batch": batch}

    def tm(name, fn, params, inputs, iters=30):
        ms = _device_time(fn, params, inputs, iters=iters) * 1e3
        report[name] = round(ms, 3)
        print(f"# {name}: {ms:.3f} ms", flush=True)

    # full config (as benched)
    model = MultiHeadModel(
        heads={"GRU_1_layer": FeatureSequenceProcessing(2, 512, "gru")},
        extractor=Wav2Vec1ConvEncoder())
    variables = model.init(jax.random.PRNGKey(0), x)
    tm("full_model", lambda v, xx: model.apply(v, xx), variables, x)

    # conv encoder alone
    enc = Wav2Vec1ConvEncoder()
    venc = enc.init(jax.random.PRNGKey(0), x)
    tm("conv_encoder", lambda v, xx: jnp.mean(enc.apply(v, xx)), venc, x)
    feats = np.asarray(enc.apply(venc, x))
    print(f"# conv features: {feats.shape}")
    report["feat_frames"] = int(feats.shape[1])
    fx = jnp.asarray(feats)

    # GRU alone, unroll sweep
    for unroll in (1, 2, 4, 8, 16, 32):
        gru = GRU(512, unroll=unroll)
        vg = gru.init(jax.random.PRNGKey(0), fx)
        tm(f"gru_unroll_{unroll}",
           lambda v, xx, g=gru: jnp.mean(g.apply(v, xx)[0]), vg, fx)

    # roofline context: the recurrent chain is T sequential
    # (B,512)x(512,1536) matmuls = T * 25 MFLOP; at ~500 steps the op
    # latency floor, not FLOPs, sets the time.
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
