"""The multimodal PhysVerb model and its classifier heads.

Rebuilds the live multimodal path of the reference (train_multimodal.py):
`PhysVerbModel` (reference models.py:823-886) = per-modality extractors with
the EMPTY protocol -> fusion module -> `PhysVerbClassifier*` heads keyed by
aggression type ('phys' from video, 'verb' from audio+text via
`modality2aggr`, reference datasets.py:592-608).

EMPTY protocol, TPU-first: the reference filled absent modalities with -1
stubs, boolean-indexed the present rows through the extractor (dynamic
shapes), and scattered features back over a zeros stub (models.py:835-863).
Here a batch carries only the *present* modalities (the reference's
`AggrBatchSampler` makes each batch homogeneous per aggression type, so
presence is known at trace time); absent modalities become static zero
feature stubs (`feature_shapes`), and a per-row {0,1} `present` mask handles
any remaining row-level absence by multiplying features to zero — identical
values to the reference's scatter, with static shapes.  One XLA program is
compiled per presence pattern (a handful of patterns total).
"""

from typing import Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchLinear


MODALITY2AGGR = {"video": "phys", "text": "verb", "audio": "verb"}


class IdentityExtractor(nn.Module):
    """Pass-through extractor (the reference's text tower, train_multimodal.py:365)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class PhysVerbClassifier(nn.Module):
    """Per-modality adaptor + per-aggr-type concat heads (reference models.py:667-735).

    adaptor_m = Linear(in, out) -> Dropout -> ReLU -> mean over time
    For each aggression type, the adapted features of its modalities are
    concatenated in sorted modality order; head = Linear(D, D//3) -> ReLU ->
    Dropout -> Linear(D//3, classes).
    """

    class_num: int
    adaptor_sizes: Mapping[str, Tuple[int, int]]  # modality -> (in, out)
    modality2aggr: Mapping[str, str] = None
    dropout: float = 0.3

    def _m2a(self):
        return dict(self.modality2aggr or MODALITY2AGGR)

    def head_names(self):
        seen = []
        for m in sorted(self.adaptor_sizes):
            a = self._m2a()[m]
            if a not in seen:
                seen.append(a)
        return seen

    def _adapt(self, feats, train):
        adapted = {}
        for name in sorted(feats):
            h = TorchLinear(self.adaptor_sizes[name][1],
                            name=f"adaptor_{name}")(feats[name])
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            h = nn.relu(h)
            adapted[name] = jnp.mean(h, axis=1)
        return adapted

    def _head(self, aggr_type, in_dim, x, train):
        h = TorchLinear(in_dim // 3, name=f"head_{aggr_type}_fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name=f"head_{aggr_type}_fc2")(h)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        m2a = self._m2a()
        adapted = self._adapt(feats, train)
        grouped: Dict[str, list] = {}
        for name in sorted(adapted):
            grouped.setdefault(m2a[name], []).append(adapted[name])
        out = {}
        for aggr_type, parts in grouped.items():
            x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            out[aggr_type] = self._head(aggr_type, x.shape[-1], x, train)
        return out


class PhysVerbClassifierConcatFeatures(PhysVerbClassifier):
    """Every aggr-type head sees the concat of ALL adapted modalities
    (reference models.py:737-770) — the live train_multimodal.py heads.

    Heads exist for every aggr type in `modality2aggr` regardless of which
    modalities are configured (reference models.py:750-752 iterates
    modality2aggr.values()): with video disabled, the 'phys' head still
    trains from the audio+text concat."""

    def head_names(self):
        seen = []
        for aggr in self._m2a().values():
            if aggr not in seen:
                seen.append(aggr)
        return seen

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        adapted = self._adapt(feats, train)
        x = jnp.concatenate([adapted[n] for n in sorted(adapted)], axis=1)
        out = {}
        for aggr_type in self.head_names():
            out[aggr_type] = self._head(aggr_type, x.shape[-1], x, train)
        return out


class PhysVerbClassifierAddFeatures(PhysVerbClassifier):
    """Heads see the element-wise SUM of adapted modalities (all out dims
    equal).  The reference's version (models.py:773-821) was dead code with a
    mismatched constructor; this is the working equivalent of its intent."""

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        adapted = self._adapt(feats, train)
        x = sum(adapted[n] for n in sorted(adapted))
        out = {}
        for aggr_type in self.head_names():
            out[aggr_type] = self._head(aggr_type, x.shape[-1], x, train)
        return out


class PhysVerbModel(nn.Module):
    """extractors -> (EMPTY-aware zero stubs) -> fusion -> PhysVerb heads.

    `batch` maps modality name -> {'data': array, 'present': (B,) 0/1}.
    Modalities in `modalities` but absent from `batch` contribute a static
    zero stub of `feature_shapes[name]` — the reference's zeros placeholder
    (models.py:848-851, shapes probed at train_multimodal.py:346-353).
    Output: {aggr_type: logits}.
    """

    extractors: Mapping[str, Optional[nn.Module]]
    classifier: nn.Module
    fusion: Optional[nn.Module] = None
    feature_shapes: Mapping[str, Tuple[int, int]] = None
    modalities: Tuple[str, ...] = ("audio", "text", "video")

    def extract_features(self, batch, train: bool = False):
        batch_size = next(iter(batch.values()))["data"].shape[0]
        feats = {}
        for name in sorted(self.modalities):
            if name in batch:
                data = batch[name]["data"]
                extractor = self.extractors.get(name)
                f = extractor(data, train=train) if extractor is not None else data
                present = batch[name].get("present")
                if present is not None:
                    f = f * present[:, None, None].astype(f.dtype)
                feats[name] = f
            else:
                t, d = self.feature_shapes[name]
                feats[name] = jnp.zeros((batch_size, t, d), jnp.float32)
        return feats

    @nn.compact
    def __call__(self, batch, train: bool = False):
        feats = self.extract_features(batch, train=train)
        if self.fusion is not None:
            feats = self.fusion(feats, train=train)
        return self.classifier(feats, train=train)

    def head_names(self):
        return self.classifier.head_names()
