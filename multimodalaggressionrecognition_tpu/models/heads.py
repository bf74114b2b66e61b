"""Sequence-classification heads and multi-head wrappers.

Rebuilds (TPU-first) the reference's head zoo:
- `FeatureSequenceProcessing` (reference models.py:107-124): GRU/LSTM/avg over
  a (B, T, E) feature sequence, classify the last timestep through
  Linear(H,256) -> ReLU -> Dropout(0.5) -> Linear(256, classes).
- `OutputClassifier` (reference models.py:378-389): mean-pool -> MLP.
- `TransformerSequenceClassifier`: the reference's
  `TransformerSequenceProcessor` (models.py:344-376) whose classifier branch
  was dead code after an early return; here the intended path (encoder ->
  mean-pool -> Linear(H,256) ReLU Dropout(0.3) Linear(256,classes)) is live,
  selectable via `return_type` ('classifier' | 'features' | 'all').
  Divergence from reference documented: the committed reference returned raw
  token sequences, which crashes its own CE loss.
- `MultiHeadModel` (VideoMultiNN / AudioMultiNN, reference models.py:152-223):
  several independent heads over shared (optionally frozen-extracted)
  features; output {head_name: logits}.  The reference's `no_grad` extractor
  freeze becomes `jax.lax.stop_gradient`.
"""

from typing import Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchLinear, TransformerEncoder
from .rnn import GRU, LSTM


class AverageFeatureSequence(nn.Module):
    """Mean over time, shaped like an RNN output ((B, 1, H), no state).

    Drop-in 'Avg' baseline for the RNN slot (reference models.py:91-97).
    """

    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=1, keepdims=True), None


class FeatureSequenceProcessing(nn.Module):
    """RNN-or-avg head classifying the last timestep."""

    class_num: int
    hidden_size: int
    cell: str = "gru"  # 'gru' | 'lstm' | 'avg'
    dropout: float = 0.5  # torch nn.Dropout() default in the reference MLP

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.cell == "gru":
            seq, _ = GRU(self.hidden_size, name="sequence_nn")(x)
        elif self.cell == "lstm":
            seq, _ = LSTM(self.hidden_size, name="sequence_nn")(x)
        elif self.cell == "avg":
            seq, _ = AverageFeatureSequence(name="sequence_nn")(x)
        else:
            raise ValueError(f"unknown cell {self.cell!r}")
        h = seq[:, -1, :]
        h = TorchLinear(256, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name="fc2")(h)


class EmbeddingLayer(nn.Module):
    """Per-timestep Linear+ReLU embedding (reference models.py:139-150)."""

    output_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.relu(TorchLinear(self.output_size, name="fc")(x))


class VideoAverageFeatures(nn.Module):
    """Mean-pool classifier (reference models.py:126-137):
    mean over time -> Linear(in,256) -> ReLU -> Dropout -> Linear(256,C)."""

    class_num: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.mean(x, axis=1)
        h = TorchLinear(256, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name="fc2")(h)


class AudioTextAdaptor(nn.Module):
    """Per-modality Linear+ReLU+Dropout adaptors, mean over time, combined by
    concat/sum/mean (reference models.py:560-600)."""

    target_dim: int
    modalities: tuple = ("audio", "text")
    dropout: float = 0.3
    combination: str = "concat"  # concat | sum | mean

    @nn.compact
    def __call__(self, features: dict, train: bool = False):
        outs = []
        for name in self.modalities:
            if name not in features:
                continue
            h = TorchLinear(self.target_dim, name=f"adaptor_{name}")(features[name])
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            outs.append(jnp.mean(h, axis=1))
        if self.combination == "concat":
            return jnp.concatenate(outs, axis=1)
        stacked = jnp.stack(outs, axis=1)
        return jnp.sum(stacked, axis=1) if self.combination == "sum" \
            else jnp.mean(stacked, axis=1)


class OutputClassifier(nn.Module):
    """Mean-pool -> Linear(in,256) -> ReLU -> Dropout(0.3) -> Linear(256,C)."""

    class_num: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.mean(x, axis=1) if x.ndim == 3 else x
        h = TorchLinear(256, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name="fc2")(h)


class TransformerSequenceClassifier(nn.Module):
    """Transformer over a feature sequence, mean-pool classification.

    `extractor` is an optional feature-extractor submodule applied first
    (identity when None — the text path feeds RuBERT embeddings directly).
    No positional encoding, matching the reference.
    """

    class_num: int
    hidden_size: int
    num_layers: int = 2
    num_heads: int = 8
    dropout: float = 0.3
    extractor: Optional[nn.Module] = None
    freeze_extractor: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, return_type: str = "classifier",
                 key_padding_mask=None):
        if self.extractor is not None:
            x = self.extractor(x)
            if self.freeze_extractor:
                x = jax.lax.stop_gradient(x)
        feats = TransformerEncoder(
            d_model=self.hidden_size, nhead=self.num_heads,
            num_layers=self.num_layers, name="encoder")(
            x, key_padding_mask=key_padding_mask, deterministic=not train)
        if return_type == "features":
            return feats
        h = jnp.mean(feats, axis=1)
        h = TorchLinear(256, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        logits = TorchLinear(self.class_num, name="fc2")(h)
        if return_type == "all":
            return logits, feats
        return logits


class MultiHeadModel(nn.Module):
    """Several independent heads over one feature tensor -> {name: logits}.

    `extractor` (optional) runs first under stop_gradient when frozen —
    the AudioMultiNN pattern (reference models.py:198-223); without an
    extractor this is VideoMultiNN (reference models.py:152-175).
    """

    heads: Mapping[str, nn.Module]
    extractor: Optional[nn.Module] = None
    freeze_extractor: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.extractor is not None:
            x = self.extractor(x)
            if self.freeze_extractor:
                x = jax.lax.stop_gradient(x)
        return {name: head(x, train=train) for name, head in self.heads.items()}

    def head_names(self):
        return list(self.heads.keys())
