import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.models.audiotext import MultimodalModel
from multimodalaggressionrecognition_tpu.models.fusion import (
    EqualSizedTransformerModalitiesFusion)
from multimodalaggressionrecognition_tpu.models.heads import OutputClassifier
from multimodalaggressionrecognition_tpu.models.physverb import IdentityExtractor


def test_multimodal_model_per_stream_classifiers(rng):
    """Reference MultimodalModel (models.py:505-558): one classifier per
    fused stream, keyed like the fused features it consumes."""
    model = MultimodalModel(
        extractors={"audio": IdentityExtractor(), "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, 32, 4),
        classifier=None,
        classifiers={"audio": OutputClassifier(class_num=2),
                     "text": OutputClassifier(class_num=3)},
        feature_shapes={}, modalities=("audio", "text"))
    batch = {
        "audio": {"data": jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32)),
                  "present": jnp.ones((2,))},
        "text": {"data": jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32)),
                 "present": jnp.ones((2,))},
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out["audio"].shape == (2, 2)
    assert out["text"].shape == (2, 3)
    assert model.head_names() == ["audio", "text"]
