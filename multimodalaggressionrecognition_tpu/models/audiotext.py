"""Audio+text two-tower model and the generic multimodal wrapper.

- `AudioTextualModel` (reference models.py:889-928): audio tower + text tower,
  mean-pool each, concat, Linear(2H,H)+ReLU+Dropout fusion MLP, MLP classifier
  (the train_audio_text.py model: CNN1D+Linear(512->768) audio tower, 2-layer
  transformer text tower).
- `MultimodalModel` (reference models.py:505-558): like PhysVerbModel but with
  one classifier per fused stream, keyed by the same name as the fused
  feature it consumes.
"""

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchLinear
from .physverb import PhysVerbModel


class AudioTextualModel(nn.Module):
    audio_extractor: nn.Module
    text_extractor: nn.Module
    hidden_size: int = 768
    class_num: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(self, batch, train: bool = False):
        audio = self.audio_extractor(batch["audio"]["data"], train=train)
        text = self.text_extractor(batch["text"]["data"], train=train)
        h = jnp.concatenate([jnp.mean(audio, axis=1), jnp.mean(text, axis=1)],
                            axis=-1)
        h = TorchLinear(self.hidden_size, name="fusion_fc")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = TorchLinear(256, name="cls_fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name="cls_fc2")(h)


class MultimodalModel(PhysVerbModel):
    """Per-stream classifiers: output {name: classifiers[name](fused[name])}."""

    classifiers: Mapping[str, nn.Module] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        feats = self.extract_features(batch, train=train)
        if self.fusion is not None:
            feats = self.fusion(feats, train=train)
        return {name: clf(feats[name], train=train)
                for name, clf in self.classifiers.items()}

    def head_names(self):
        return list(self.classifiers.keys())
