"""Wav2vec-family audio feature encoders, TPU-first.

The reference consumed frozen audio extractors three ways (reference
models.py:177-193, train_audio_rnn.py:106-115, train_multimodal.py:176):
  1. a TorchScript wav2vec-1 conv encoder (512-d) — the serialized blob is
     absent from the reference repo (.MISSING_LARGE_BLOBS), so this rebuild is
     best-effort from the public wav2vec-1 architecture;
  2. torchaudio WAV2VEC2_BASE / HuBERT bundles via
     `extract_features(x)[0][-1]` (last transformer layer output);
  3. the trainable CNN1D wrapper (models/cnn1d.py).

Here the conv feature encoder lowers each strided conv to frame+matmul on the
MXU (ops/framing.py); the transformer reuses models.layers with gelu and the
pre/post-LN variants.  Weight conversion from torchaudio state_dicts lives in
io/torch_import.py (q/k/v packed into in_proj).
"""

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from ..ops.erf import gelu_exact
from .layers import TorchLayerNorm, TorchLinear, TransformerEncoderLayer
from .nn1d import Conv1d, GroupNorm


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2))
    extractor_mode: str = "group_norm"  # 'group_norm' | 'layer_norm'
    conv_bias: bool = False
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ff_dim: int = 3072
    dropout: float = 0.1
    layer_norm_first: bool = False
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16


WAV2VEC2_BASE = Wav2Vec2Config()
HUBERT_BASE = Wav2Vec2Config()
HUBERT_LARGE = Wav2Vec2Config(
    extractor_mode="layer_norm", conv_bias=True, embed_dim=1024,
    num_layers=24, num_heads=16, ff_dim=4096, layer_norm_first=True)
HUBERT_XLARGE = Wav2Vec2Config(
    extractor_mode="layer_norm", conv_bias=True, embed_dim=1280,
    num_layers=48, num_heads=16, ff_dim=5120, layer_norm_first=True)

# Best-effort wav2vec-1 conv feature encoder (512-d); the reference's JIT
# artifact is missing, so strides/kernels follow the public fairseq defaults.
WAV2VEC1_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2))


class ConvFeatureEncoder(nn.Module):
    """Strided conv stack: (B, L) waveform -> (B, T, C) features, GELU acts."""

    conv_layers: Sequence[Tuple[int, int, int]] = WAV2VEC2_BASE.conv_layers
    mode: str = "group_norm"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        for i, (feats, k, s) in enumerate(self.conv_layers):
            x = Conv1d(feats, k, stride=s, use_bias=self.use_bias,
                       name=f"conv{i}")(x)
            if self.mode == "group_norm" and i == 0:
                x = GroupNorm(num_groups=feats, name=f"norm{i}")(x)
            elif self.mode == "layer_norm":
                x = TorchLayerNorm(name=f"norm{i}")(x)
            x = gelu_exact(x)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped Conv1d positional embedding (k=128, groups=16) + GELU."""

    embed_dim: int
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x):
        e = self.embed_dim
        # kernel layout (K, C_in/groups, C_out) for lax.conv with NWC/WIO
        weight = self.param(
            "kernel", nn.initializers.normal(stddev=(4.0 / (self.kernel * e)) ** 0.5),
            (self.kernel, e // self.groups, e))
        bias = self.param("bias", nn.initializers.zeros, (e,))
        pad = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x, weight, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups)
        y = y + bias
        if self.kernel % 2 == 0:
            y = y[:, :-1, :]
        return gelu_exact(y)


class Wav2Vec2Model(nn.Module):
    """Conv encoder + feature projection + transformer.

    `__call__` returns the last transformer layer output — the tensor the
    reference's `Wav2vec2Extractor.forward` produced via
    `extract_features(x)[0][-1]` (reference models.py:188-193).
    `num_outputs` can truncate the stack like torchaudio's num_layers arg;
    per fairseq/torchaudio/HF semantics the pre-LN models' final encoder
    LayerNorm is applied only on the FULL forward (HF last_hidden_state),
    never on truncated intermediate outputs (torchaudio
    Transformer.get_intermediate_outputs).  Logit parity vs an in-test HF
    torch model: tests/test_wav2vec2_parity.py.
    """

    config: Wav2Vec2Config = WAV2VEC2_BASE

    @nn.compact
    def __call__(self, x, train: bool = False, num_outputs: Optional[int] = None):
        cfg = self.config
        feats = ConvFeatureEncoder(cfg.conv_layers, cfg.extractor_mode,
                                   cfg.conv_bias, name="feature_extractor")(x)
        h = TorchLayerNorm(name="fp_norm")(feats)
        h = TorchLinear(cfg.embed_dim, name="fp_proj")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)

        pos = ConvPositionalEmbedding(cfg.embed_dim, cfg.pos_conv_kernel,
                                      cfg.pos_conv_groups, name="pos_conv")(h)
        h = h + pos
        if not cfg.layer_norm_first:
            h = TorchLayerNorm(name="encoder_norm")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)

        n_layers = cfg.num_layers if num_outputs is None else num_outputs
        for i in range(n_layers):
            h = TransformerEncoderLayer(
                cfg.embed_dim, cfg.num_heads, cfg.ff_dim, cfg.dropout,
                activation="gelu", norm_first=cfg.layer_norm_first,
                name=f"layers_{i}")(h, deterministic=not train)
        if cfg.layer_norm_first and num_outputs is None:
            h = TorchLayerNorm(name="encoder_norm")(h)
        return h


class Wav2Vec1ConvEncoder(nn.Module):
    """Best-effort wav2vec-1 512-d conv feature encoder.

    Replaces the reference's missing `wav2vec_feature_extractor_jit.pt`
    (reference train_audio_rnn.py:108).  Each conv is followed by a
    single-group GroupNorm and ReLU, per the public fairseq wav2vec design.
    Output (B, T, 512).
    """

    conv_layers: Sequence[Tuple[int, int, int]] = WAV2VEC1_CONV_LAYERS

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        for i, (feats, k, s) in enumerate(self.conv_layers):
            x = Conv1d(feats, k, stride=s, use_bias=False, name=f"conv{i}")(x)
            x = GroupNorm(num_groups=1, name=f"norm{i}")(x)
            x = nn.relu(x)
        return x
