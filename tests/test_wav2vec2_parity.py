"""End-to-end torch logit parity for the wav2vec2 / HuBERT extractor family.

Ground truth is the installed HF `transformers` torch implementation — a
faithful port of the same fairseq graph the reference consumed through
torchaudio bundles (reference models.py:188-193 `extract_features(x)[0][-1]`;
HuBERT-XL at train_multimodal.py:176).  Covers the two encoder variants:

  - post-LN  (WAV2VEC2_BASE / HuBERT-base): group-norm conv stack,
    encoder-level LN *before* the layers;
  - pre-LN   (HuBERT-large family): per-layer LN conv stack, conv_bias,
    final encoder LN *after* the layers (HF last_hidden_state semantics).

Both go through io/torch_import.wav2vec2_hf (state-dict rename +
torchaudio-layout converter), so the test also pins the weight-norm
positional-conv resolution (`parametrizations.weight.original{0,1}` on
newer torch) and the packed-qkv conversion.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.wav2vec import (
    HUBERT_LARGE, WAV2VEC2_BASE, Wav2Vec2Config, Wav2Vec2Model)


def _hf_config(cfg: Wav2Vec2Config, num_layers: int):
    from transformers import Wav2Vec2Config as HFConfig

    return HFConfig(
        conv_dim=tuple(c for c, _, _ in cfg.conv_layers),
        conv_kernel=tuple(k for _, k, _ in cfg.conv_layers),
        conv_stride=tuple(s for _, _, s in cfg.conv_layers),
        num_feat_extract_layers=len(cfg.conv_layers),
        feat_extract_norm={"group_norm": "group",
                           "layer_norm": "layer"}[cfg.extractor_mode],
        conv_bias=cfg.conv_bias,
        hidden_size=cfg.embed_dim,
        num_hidden_layers=num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ff_dim,
        do_stable_layer_norm=cfg.layer_norm_first,
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


def _parity_case(cfg: Wav2Vec2Config, num_layers: int, atol: float):
    from transformers import Wav2Vec2Model as HFModel

    small = Wav2Vec2Config(
        conv_layers=cfg.conv_layers, extractor_mode=cfg.extractor_mode,
        conv_bias=cfg.conv_bias, embed_dim=cfg.embed_dim,
        num_layers=num_layers, num_heads=cfg.num_heads, ff_dim=cfg.ff_dim,
        layer_norm_first=cfg.layer_norm_first,
        pos_conv_kernel=cfg.pos_conv_kernel,
        pos_conv_groups=cfg.pos_conv_groups)

    torch.manual_seed(0)
    tmodel = HFModel(_hf_config(cfg, num_layers)).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(wav)).last_hidden_state.numpy()

    variables = torch_import.wav2vec2_hf(
        sd, num_layers=num_layers, extractor_layers=len(cfg.conv_layers),
        extractor_mode=cfg.extractor_mode)
    model = Wav2Vec2Model(small)
    # structure check vs a fresh init (catches converter drift);
    # eval_shape: the structure needs no compute
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 4000)))
    assert jax.tree.structure(init) == jax.tree.structure(
        jax.tree.map(jnp.asarray, variables))
    got = np.asarray(jax.jit(model.apply)(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol)


@pytest.mark.slow
def test_wav2vec2_base_post_ln_logit_parity():
    """Full WAV2VEC2_BASE: 7-conv group-norm stack + 12 post-LN layers."""
    _parity_case(WAV2VEC2_BASE, num_layers=12, atol=2e-3)


@pytest.mark.slow
def test_hubert_large_pre_ln_logit_parity():
    """HuBERT-large geometry (pre-LN, conv_bias, layer-norm extractor);
    6 layers keep the CPU run bounded while exercising the exact variant
    code paths (the remaining 18 layers repeat the same block)."""
    _parity_case(HUBERT_LARGE, num_layers=6, atol=2e-3)


@pytest.mark.slow
def test_truncated_outputs_skip_final_norm():
    """num_outputs truncation must reproduce torchaudio's
    get_intermediate_outputs: NO final LN on intermediate layers (pre-LN).
    HF equivalent: hidden_states[k] before the final norm."""
    from transformers import Wav2Vec2Model as HFModel

    cfg = Wav2Vec2Config(
        extractor_mode="layer_norm", conv_bias=True, embed_dim=64,
        num_layers=3, num_heads=4, ff_dim=128, layer_norm_first=True)
    torch.manual_seed(1)
    tmodel = HFModel(_hf_config(cfg, 3)).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        hidden = tmodel(torch.from_numpy(wav),
                        output_hidden_states=True).hidden_states
    variables = torch_import.wav2vec2_hf(sd, num_layers=3,
                                         extractor_mode="layer_norm")
    model = Wav2Vec2Model(cfg)
    v = jax.tree.map(jnp.asarray, variables)
    got2 = np.asarray(jax.jit(model.apply, static_argnames="num_outputs")(
        v, jnp.asarray(wav), num_outputs=2))
    # HF hidden_states[k] = input of layer k (pre-LN stack, un-normed)
    np.testing.assert_allclose(got2, hidden[2].numpy(), atol=1e-4)
