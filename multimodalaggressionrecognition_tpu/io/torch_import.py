"""Torch checkpoint -> Flax parameter conversion.

Converts reference-model state_dicts (numpy-valued; call `.numpy()` on torch
tensors or pass a dict of arrays) into this framework's parameter pytrees.
Layout rules:

- Linear:  kernel = weight.T                        (in, out)
- Conv1d:  kernel = weight.transpose(2, 1, 0).reshape(K*C_in, C_out)
- Conv3d:  kernel = weight.transpose(2, 3, 4, 1, 0) (D, H, W, C_in, C_out)
- RNN:     kernel_ih/hh = weight_ih/hh.T, biases unchanged (torch gate order)
- MHA:     in_proj_kernel = in_proj_weight.T, out_proj_kernel = out_proj.weight.T
- Norms:   scale = weight, bias = bias; BN running stats -> batch_stats
"""

import numpy as np


def _t(x):
    return np.asarray(x)


def linear(sd, prefix):
    p = {"kernel": _t(sd[prefix + "weight"]).T}
    if prefix + "bias" in sd:
        p["bias"] = _t(sd[prefix + "bias"])
    return p


def conv1d(sd, prefix):
    w = _t(sd[prefix + "weight"])  # (C_out, C_in, K)
    p = {"kernel": w.transpose(2, 1, 0).reshape(-1, w.shape[0])}
    if prefix + "bias" in sd:
        p["bias"] = _t(sd[prefix + "bias"])
    return p


def conv2d(sd, prefix):
    w = _t(sd[prefix + "weight"])  # (C_out, C_in, H, W)
    p = {"kernel": w.transpose(2, 3, 1, 0)}
    if prefix + "bias" in sd:
        p["bias"] = _t(sd[prefix + "bias"])
    return p


def conv3d(sd, prefix):
    w = _t(sd[prefix + "weight"])  # (C_out, C_in, D, H, W)
    p = {"kernel": w.transpose(2, 3, 4, 1, 0)}
    if prefix + "bias" in sd:
        p["bias"] = _t(sd[prefix + "bias"])
    return p


def norm(sd, prefix):
    """LayerNorm / GroupNorm / BN affine params."""
    return {"scale": _t(sd[prefix + "weight"]), "bias": _t(sd[prefix + "bias"])}


def bn_stats(sd, prefix):
    return {"mean": _t(sd[prefix + "running_mean"]),
            "var": _t(sd[prefix + "running_var"])}


def rnn(sd, prefix="", layer=0):
    sfx = f"_l{layer}"
    return {
        "kernel_ih": _t(sd[f"{prefix}weight_ih{sfx}"]).T,
        "kernel_hh": _t(sd[f"{prefix}weight_hh{sfx}"]).T,
        "bias_ih": _t(sd[f"{prefix}bias_ih{sfx}"]),
        "bias_hh": _t(sd[f"{prefix}bias_hh{sfx}"]),
    }


def mha(sd, prefix):
    return {
        "in_proj_kernel": _t(sd[prefix + "in_proj_weight"]).T,
        "in_proj_bias": _t(sd[prefix + "in_proj_bias"]),
        "out_proj_kernel": _t(sd[prefix + "out_proj.weight"]).T,
        "out_proj_bias": _t(sd[prefix + "out_proj.bias"]),
    }


def transformer_encoder_layer(sd, prefix):
    return {
        "self_attn": mha(sd, prefix + "self_attn."),
        "norm1": norm(sd, prefix + "norm1."),
        "norm2": norm(sd, prefix + "norm2."),
        "linear1": linear(sd, prefix + "linear1."),
        "linear2": linear(sd, prefix + "linear2."),
    }


def transformer_encoder(sd, prefix, num_layers, final_norm=True):
    p = {f"layers_{i}": transformer_encoder_layer(sd, f"{prefix}layers.{i}.")
         for i in range(num_layers)}
    if final_norm:
        p["norm"] = norm(sd, prefix + "norm.")
    return p


def _sequential_conv_bn_indices(sd, prefix):
    """Locate conv/BN module indices inside a torch Sequential state_dict."""
    conv_idx, bn_idx = [], []
    i = 0
    seen = set()
    for key in sd:
        if not key.startswith(prefix):
            continue
        idx = int(key[len(prefix):].split(".")[0])
        if idx in seen:
            continue
        seen.add(idx)
        if f"{prefix}{idx}.running_mean" in sd:
            bn_idx.append(idx)
        elif f"{prefix}{idx}.weight" in sd:
            conv_idx.append(idx)
    return sorted(conv_idx), sorted(bn_idx)


def cnn1d_extractor(sd, prefix="extractor."):
    """Reference CNN1D conv trunk (a torch Sequential) -> CNN1DExtractor tree."""
    conv_idx, bn_idx = _sequential_conv_bn_indices(sd, prefix)
    params, stats = {}, {}
    for j, (ci, bi) in enumerate(zip(conv_idx, bn_idx)):
        params[f"conv{j}"] = conv1d(sd, f"{prefix}{ci}.")
        params[f"bn{j}"] = norm(sd, f"{prefix}{bi}.")
        stats[f"bn{j}"] = bn_stats(sd, f"{prefix}{bi}.")
    return params, stats


def cnn1d(sd):
    """Full reference CNN1D (extractor Sequential + classifier Sequential)."""
    ext_params, ext_stats = cnn1d_extractor(sd, "extractor.")
    params = {"extractor": ext_params,
              "head": linear(sd, "classifier.3.")}
    return {"params": params, "batch_stats": {"extractor": ext_stats}}


def audio_cnn1d_wrapper(sd):
    """Reference AudioCnn1DExtractorWrapper (models.py:265-282)."""
    ext_params, ext_stats = cnn1d_extractor(sd, "extractor.")
    params = {"extractor": ext_params,
              "adaptor": linear(sd, "adaptor.0.")}
    return {"params": params, "batch_stats": {"extractor": ext_stats}}


def _basic_block3d(sd, prefix):
    """torchvision video BasicBlock: conv1/conv2 are Sequential(conv, bn[, relu])."""
    params = {"conv1": conv3d(sd, prefix + "conv1.0."),
              "bn1": norm(sd, prefix + "conv1.1."),
              "conv2": conv3d(sd, prefix + "conv2.0."),
              "bn2": norm(sd, prefix + "conv2.1.")}
    stats = {"bn1": bn_stats(sd, prefix + "conv1.1."),
             "bn2": bn_stats(sd, prefix + "conv2.1.")}
    if prefix + "downsample.0.weight" in sd:
        params["downsample_conv"] = conv3d(sd, prefix + "downsample.0.")
        params["downsample_bn"] = norm(sd, prefix + "downsample.1.")
        stats["downsample_bn"] = bn_stats(sd, prefix + "downsample.1.")
    return params, stats


def r3d18_trunk(sd, prefix=""):
    """torchvision r3d_18 backbone (stem + layer1..4) -> R3D18Trunk tree."""
    params = {"stem": {"conv": conv3d(sd, prefix + "stem.0."),
                       "bn": norm(sd, prefix + "stem.1.")}}
    stats = {"stem": {"bn": bn_stats(sd, prefix + "stem.1.")}}
    for layer in range(1, 5):
        for block in range(2):
            p, s = _basic_block3d(sd, f"{prefix}layer{layer}.{block}.")
            params[f"layer{layer}_{block}"] = p
            stats[f"layer{layer}_{block}"] = s
    return params, stats


def r3d18(sd):
    """Full torchvision r3d_18 (Kinetics head) -> R3D18Classifier variables."""
    trunk_params, trunk_stats = r3d18_trunk(sd)
    return {"params": {"trunk": trunk_params, "fc": linear(sd, "fc.")},
            "batch_stats": {"trunk": trunk_stats}}


def _packed_qkv(sd, prefix):
    """torchaudio wav2vec2 separate q/k/v projections -> packed in_proj."""
    q_w, k_w, v_w = (_t(sd[prefix + f"{n}_proj.weight"]) for n in "qkv")
    q_b, k_b, v_b = (_t(sd[prefix + f"{n}_proj.bias"]) for n in "qkv")
    return {
        "in_proj_kernel": np.concatenate([q_w, k_w, v_w], axis=0).T,
        "in_proj_bias": np.concatenate([q_b, k_b, v_b]),
        "out_proj_kernel": _t(sd[prefix + "out_proj.weight"]).T,
        "out_proj_bias": _t(sd[prefix + "out_proj.bias"]),
    }


def _weight_norm_conv1d(sd, prefix):
    """Resolve torch weight_norm (dim=2): w = g * v / ||v||_(0,1).

    Accepts both the legacy `weight_g`/`weight_v` naming and the
    parametrize-based `parametrizations.weight.original{0,1}` naming that
    newer torch (and HF transformers) produce."""
    if prefix + "weight_g" in sd:
        g = _t(sd[prefix + "weight_g"])  # (1, 1, K)
        v = _t(sd[prefix + "weight_v"])  # (C_out, C_in/groups, K)
    else:
        g = _t(sd[prefix + "parametrizations.weight.original0"])
        v = _t(sd[prefix + "parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    # -> (K, C_in/groups, C_out) for lax.conv WIO
    return {"kernel": w.transpose(2, 1, 0), "bias": _t(sd[prefix + "bias"])}


def wav2vec2(sd, num_layers=12, extractor_layers=7, extractor_mode="group_norm"):
    """torchaudio Wav2Vec2Model / HuBERT state_dict -> Wav2Vec2Model tree.

    torchaudio layout: feature_extractor.conv_layers.{i}.{conv,layer_norm},
    encoder.feature_projection.{layer_norm,projection},
    encoder.transformer.{pos_conv_embed.conv, layer_norm, layers.{i}.
    {attention, layer_norm, feed_forward.{intermediate_dense,output_dense},
    final_layer_norm}}.
    """
    fe = {}
    for i in range(extractor_layers):
        p = f"feature_extractor.conv_layers.{i}."
        fe[f"conv{i}"] = conv1d(sd, p + "conv.")
        if extractor_mode == "layer_norm" or i == 0:
            fe[f"norm{i}"] = norm(sd, p + "layer_norm.")
    params = {
        "feature_extractor": fe,
        "fp_norm": norm(sd, "encoder.feature_projection.layer_norm."),
        "fp_proj": linear(sd, "encoder.feature_projection.projection."),
        "pos_conv": _weight_norm_conv1d(
            sd, "encoder.transformer.pos_conv_embed.conv."),
        "encoder_norm": norm(sd, "encoder.transformer.layer_norm."),
    }
    for i in range(num_layers):
        p = f"encoder.transformer.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": _packed_qkv(sd, p + "attention."),
            "norm1": norm(sd, p + "layer_norm."),
            "linear1": linear(sd, p + "feed_forward.intermediate_dense."),
            "linear2": linear(sd, p + "feed_forward.output_dense."),
            "norm2": norm(sd, p + "final_layer_norm."),
        }
    return {"params": params}


def wav2vec2_hf(sd, num_layers=12, extractor_layers=7,
                extractor_mode="group_norm"):
    """HF `transformers` Wav2Vec2Model/HubertModel state_dict -> params.

    HF's module tree is the same fairseq graph under slightly different
    names (no `encoder.transformer.` nesting, `feature_projection` at top
    level); rename and reuse the torchaudio converter.  HF GroupNorm conv
    layers store the norm as `layer_norm` too, so the feature-extractor
    keys line up as-is.
    """
    renames = (
        ("feature_projection.", "encoder.feature_projection."),
        ("encoder.pos_conv_embed.", "encoder.transformer.pos_conv_embed."),
        ("encoder.layer_norm.", "encoder.transformer.layer_norm."),
        ("encoder.layers.", "encoder.transformer.layers."),
    )
    out = {}
    for k, v in sd.items():
        for old, new in renames:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return wav2vec2(out, num_layers, extractor_layers, extractor_mode)


def _swin_block(sd, prefix):
    return {
        "norm1": norm(sd, prefix + "norm1."),
        "norm2": norm(sd, prefix + "norm2."),
        "attn": {
            "qkv": linear(sd, prefix + "attn.qkv."),
            "proj": linear(sd, prefix + "attn.proj."),
            "relative_position_bias_table": _t(
                sd[prefix + "attn.relative_position_bias_table"]),
        },
        "mlp_fc1": linear(sd, prefix + "mlp.0."),
        "mlp_fc2": linear(sd, prefix + "mlp.3."),
    }


def swin3d_t(sd, depths=(2, 2, 6, 2)):
    """torchvision swin3d_t backbone -> SwinTransformer3d params.

    torchvision layout: patch_embed.proj/norm; features = Sequential
    [stage0, PatchMerging, stage1, PatchMerging, stage2, PatchMerging,
    stage3]; final norm.  (No running stats — pure params.)
    """
    params = {"patch_embed": conv3d(sd, "patch_embed.proj."),
              "patch_norm": norm(sd, "patch_embed.norm.")}
    feat_idx = 0
    for stage, depth in enumerate(depths):
        for i in range(depth):
            params[f"stage{stage}_block{i}"] = _swin_block(
                sd, f"features.{feat_idx}.{i}.")
        feat_idx += 1
        if stage < len(depths) - 1:
            params[f"merge{stage}"] = {
                "norm": norm(sd, f"features.{feat_idx}.norm."),
                "reduction": linear(sd, f"features.{feat_idx}.reduction."),
            }
            feat_idx += 1
    params["norm"] = norm(sd, "norm.")
    return {"params": params}


def _conv_bn_act(sd, prefix):
    """torchvision Conv3dNormActivation (Sequential conv, bn, relu)."""
    return ({"conv": conv3d(sd, prefix + "0."), "bn": norm(sd, prefix + "1.")},
            {"bn": bn_stats(sd, prefix + "1.")})


def _temp_sep_conv(sd, prefix):
    sp, ss = _conv_bn_act(sd, prefix + "0.")
    tp, ts = _conv_bn_act(sd, prefix + "1.")
    return {"spatial": sp, "temporal": tp}, {"spatial": ss, "temporal": ts}


def s3d_features(sd, prefix="features."):
    """torchvision S3D `features` Sequential -> S3DFeatures tree.

    Sequential indices: 0 TempSep stem, 1 pool, 2 ConvBN, 3 TempSep,
    4 pool, then inception blocks at 5,6, 8,9,10,11,12, 14,15 (pools at
    7, 13).
    """
    params, stats = {}, {}
    params["stem0"], stats["stem0"] = _temp_sep_conv(sd, prefix + "0.")
    params["stem1"], stats["stem1"] = _conv_bn_act(sd, prefix + "2.")
    params["stem2"], stats["stem2"] = _temp_sep_conv(sd, prefix + "3.")
    inception_seq_idx = [5, 6, 8, 9, 10, 11, 12, 14, 15]
    for j, si in enumerate(inception_seq_idx):
        p, s = {}, {}
        base = f"{prefix}{si}.branch"
        p["branch0"], s["branch0"] = _conv_bn_act(sd, base + "0.")
        b1c, b1s = _conv_bn_act(sd, base + "1.0.")
        b1t, b1ts = _temp_sep_conv(sd, base + "1.1.")
        p["branch1_0"], s["branch1_0"] = b1c, b1s
        p["branch1_1"], s["branch1_1"] = b1t, b1ts
        b2c, b2s = _conv_bn_act(sd, base + "2.0.")
        b2t, b2ts = _temp_sep_conv(sd, base + "2.1.")
        p["branch2_0"], s["branch2_0"] = b2c, b2s
        p["branch2_1"], s["branch2_1"] = b2t, b2ts
        p["branch3_1"], s["branch3_1"] = _conv_bn_act(sd, base + "3.1.")
        params[f"inception{j}"] = p
        stats[f"inception{j}"] = s
    return params, stats


def s3d(sd):
    """Full torchvision S3D -> S3DClassifier variables."""
    feats, stats = s3d_features(sd)
    params = {"features": feats, "head": conv3d(sd, "classifier.1.")}
    return {"params": params, "batch_stats": {"features": stats}}


def vgg11_bn(sd):
    """torchvision vgg11_bn -> VGG11BN variables."""
    conv_idx, bn_idx = _sequential_conv_bn_indices(sd, "features.")
    params, stats = {}, {}
    for j, (ci, bi) in enumerate(zip(conv_idx, bn_idx)):
        params[f"conv{j}"] = conv2d(sd, f"features.{ci}.")
        params[f"bn{j}"] = norm(sd, f"features.{bi}.")
        stats[f"bn{j}"] = bn_stats(sd, f"features.{bi}.")
    params["fc1"] = linear(sd, "classifier.0.")
    params["fc2"] = linear(sd, "classifier.3.")
    params["fc3"] = linear(sd, "classifier.6.")
    return {"params": params, "batch_stats": stats}
