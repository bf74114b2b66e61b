"""Inference-time BatchNorm folding for conv trunks.

For eval-mode Conv -> BN -> ReLU chains, BN is an affine map with frozen
statistics and can be folded into the convolution:
    k = gamma / sqrt(var + eps)
    w' = w * k        (per output channel)
    b' = (b - mean) * k + beta
After folding, the CNN1D stem's Pallas kernel epilogue (scale/shift/relu —
ops/pallas/framed_conv.py) is the identity scale, and XLA sees one fewer
normalization per conv at serving time.
"""

import jax.numpy as jnp


def fold_conv_bn(conv_params, bn_params, bn_stats, eps: float = 1e-5):
    """Fold one BN (scale/bias, mean/var) into a conv's kernel/bias.

    Works for any kernel whose LAST axis is the output channel (Conv1d's
    (K*C_in, C_out), ConvNd's (*K, C_in, C_out))."""
    k = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    kernel = conv_params["kernel"] * k
    bias = conv_params.get("bias", 0.0)
    bias = (bias - bn_stats["mean"]) * k + bn_params["bias"]
    return {"kernel": kernel, "bias": bias}


def fold_cnn1d_extractor(extractor_params, extractor_stats, eps: float = 1e-5):
    """Fold every convN/bnN pair of a CNN1DExtractor tree.

    Returns params for `CNN1DExtractor(folded=True)` (BN modules skipped):
    same convN names, BN params replaced by identity (unused)."""
    folded = dict(extractor_params)
    i = 0
    while f"conv{i}" in extractor_params:
        folded[f"conv{i}"] = fold_conv_bn(
            extractor_params[f"conv{i}"], extractor_params[f"bn{i}"],
            extractor_stats[f"bn{i}"], eps)
        i += 1
    return folded


def fold_cnn1d_variables(variables, path=("extractor",), eps: float = 1e-5):
    """Fold a CNN1D / AudioCnn1DExtractorWrapper variables dict.

    `path` locates the extractor subtree inside params/batch_stats.
    Returns a new variables dict (params only — no batch_stats needed) for
    the `folded=True` model variant."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sub_p, sub_s = params, stats
    for name in path:
        sub_p = sub_p[name]
        sub_s = sub_s[name]
    folded_sub = fold_cnn1d_extractor(sub_p, sub_s, eps)

    def rebuild(tree, target, repl):
        if not target:
            return repl
        out = dict(tree)
        out[target[0]] = rebuild(tree[target[0]], target[1:], repl)
        return out

    return {"params": rebuild(params, list(path), folded_sub)}
