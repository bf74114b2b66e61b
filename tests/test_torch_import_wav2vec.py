"""Round-trip check of the wav2vec2 state_dict converter (torchaudio layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.wav2vec import (
    Wav2Vec2Config, Wav2Vec2Model)

CFG = Wav2Vec2Config(
    conv_layers=((16, 10, 5), (16, 3, 2)), embed_dim=32, num_layers=2,
    num_heads=4, ff_dim=64, pos_conv_kernel=8, pos_conv_groups=2)


def _to_torch_sd(params):
    sd = {}
    fe = params["feature_extractor"]
    for i in range(2):
        k = np.asarray(fe[f"conv{i}"]["kernel"])  # (K*Cin, Cout)
        c_out = k.shape[1]
        kk = 10 if i == 0 else 3
        c_in = k.shape[0] // kk
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = (
            k.reshape(kk, c_in, c_out).transpose(2, 1, 0))
        if f"norm{i}" in fe:
            sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"] = \
                np.asarray(fe[f"norm{i}"]["scale"])
            sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"] = \
                np.asarray(fe[f"norm{i}"]["bias"])
    for mine, theirs in (("fp_norm", "encoder.feature_projection.layer_norm"),
                         ("encoder_norm", "encoder.transformer.layer_norm")):
        sd[theirs + ".weight"] = np.asarray(params[mine]["scale"])
        sd[theirs + ".bias"] = np.asarray(params[mine]["bias"])
    sd["encoder.feature_projection.projection.weight"] = np.asarray(
        params["fp_proj"]["kernel"]).T
    sd["encoder.feature_projection.projection.bias"] = np.asarray(
        params["fp_proj"]["bias"])
    # pos conv: invert weight-norm by using v = w, g = ||w||
    w = np.asarray(params["pos_conv"]["kernel"]).transpose(2, 1, 0)  # (Co, Ci/g, K)
    g = np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))
    sd["encoder.transformer.pos_conv_embed.conv.weight_g"] = g
    sd["encoder.transformer.pos_conv_embed.conv.weight_v"] = w
    sd["encoder.transformer.pos_conv_embed.conv.bias"] = np.asarray(
        params["pos_conv"]["bias"])
    for i in range(2):
        b = params[f"layers_{i}"]
        p = f"encoder.transformer.layers.{i}."
        qkv = np.asarray(b["self_attn"]["in_proj_kernel"]).T  # (3E, E)
        qb = np.asarray(b["self_attn"]["in_proj_bias"])
        e = qkv.shape[1]
        for j, n in enumerate("qkv"):
            sd[p + f"attention.{n}_proj.weight"] = qkv[j * e:(j + 1) * e]
            sd[p + f"attention.{n}_proj.bias"] = qb[j * e:(j + 1) * e]
        sd[p + "attention.out_proj.weight"] = np.asarray(
            b["self_attn"]["out_proj_kernel"]).T
        sd[p + "attention.out_proj.bias"] = np.asarray(
            b["self_attn"]["out_proj_bias"])
        for mine, theirs in (("norm1", "layer_norm"),
                             ("norm2", "final_layer_norm"),
                             ("linear1", "feed_forward.intermediate_dense"),
                             ("linear2", "feed_forward.output_dense")):
            src = b[mine]
            if "scale" in src:
                sd[p + theirs + ".weight"] = np.asarray(src["scale"])
                sd[p + theirs + ".bias"] = np.asarray(src["bias"])
            else:
                sd[p + theirs + ".weight"] = np.asarray(src["kernel"]).T
                sd[p + theirs + ".bias"] = np.asarray(src["bias"])
    return sd


def test_wav2vec2_converter_roundtrip(rng):
    model = Wav2Vec2Model(CFG)
    x = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = _to_torch_sd(variables["params"])
    restored = torch_import.wav2vec2(sd, num_layers=2, extractor_layers=2)
    y0 = model.apply(variables, x)
    y1 = model.apply(jax.tree.map(jnp.asarray, restored), x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
