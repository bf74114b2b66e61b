"""Round-trip check of the swin3d_t state_dict converter.

torchvision is unavailable here, so a torch-layout state_dict is synthesized
from an initialized Flax model (inverse of the documented mapping) and pushed
back through io.torch_import.swin3d_t — output must equal the original params
and drive an identical forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.swin3d import SwinTransformer3d


def _to_torch_sd(params, depths=(2, 2, 6, 2)):
    sd = {}
    sd["patch_embed.proj.weight"] = np.asarray(
        params["patch_embed"]["kernel"]).transpose(4, 3, 0, 1, 2)
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    sd["patch_embed.norm.weight"] = np.asarray(params["patch_norm"]["scale"])
    sd["patch_embed.norm.bias"] = np.asarray(params["patch_norm"]["bias"])
    feat_idx = 0
    for stage, depth in enumerate(depths):
        for i in range(depth):
            b = params[f"stage{stage}_block{i}"]
            p = f"features.{feat_idx}.{i}."
            for ln in ("norm1", "norm2"):
                sd[p + ln + ".weight"] = np.asarray(b[ln]["scale"])
                sd[p + ln + ".bias"] = np.asarray(b[ln]["bias"])
            sd[p + "attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["kernel"]).T
            sd[p + "attn.qkv.bias"] = np.asarray(b["attn"]["qkv"]["bias"])
            sd[p + "attn.proj.weight"] = np.asarray(b["attn"]["proj"]["kernel"]).T
            sd[p + "attn.proj.bias"] = np.asarray(b["attn"]["proj"]["bias"])
            sd[p + "attn.relative_position_bias_table"] = np.asarray(
                b["attn"]["relative_position_bias_table"])
            sd[p + "mlp.0.weight"] = np.asarray(b["mlp_fc1"]["kernel"]).T
            sd[p + "mlp.0.bias"] = np.asarray(b["mlp_fc1"]["bias"])
            sd[p + "mlp.3.weight"] = np.asarray(b["mlp_fc2"]["kernel"]).T
            sd[p + "mlp.3.bias"] = np.asarray(b["mlp_fc2"]["bias"])
        feat_idx += 1
        if stage < len(depths) - 1:
            m = params[f"merge{stage}"]
            p = f"features.{feat_idx}."
            sd[p + "norm.weight"] = np.asarray(m["norm"]["scale"])
            sd[p + "norm.bias"] = np.asarray(m["norm"]["bias"])
            sd[p + "reduction.weight"] = np.asarray(m["reduction"]["kernel"]).T
            feat_idx += 1
    sd["norm.weight"] = np.asarray(params["norm"]["scale"])
    sd["norm.bias"] = np.asarray(params["norm"]["bias"])
    return sd


def test_swin3d_converter_roundtrip(rng):
    model = SwinTransformer3d(embed_dim=8, depths=(1, 1), num_heads=(2, 4),
                              window=(2, 3, 3))
    x = jnp.asarray(rng.standard_normal((1, 4, 12, 12, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = _to_torch_sd(variables["params"], depths=(1, 1))
    restored = torch_import.swin3d_t(sd, depths=(1, 1))
    y0 = model.apply(variables, x)
    y1 = model.apply(jax.tree.map(jnp.asarray, restored), x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
