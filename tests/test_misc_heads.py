"""Small reference modules: EmbeddingLayer, VideoAverageFeatures, AudioTextAdaptor."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.models.heads import (
    AudioTextAdaptor, EmbeddingLayer, VideoAverageFeatures)


def test_embedding_layer(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    m = EmbeddingLayer(8)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 5, 8)
    assert (np.asarray(y) >= 0).all()  # ReLU


def test_video_average_features(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    m = VideoAverageFeatures(class_num=3)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(variables, x).shape == (2, 3)


def test_audio_text_adaptor_combinations(rng):
    feats = {"audio": jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32)),
             "text": jnp.asarray(rng.standard_normal((2, 4, 16)).astype(np.float32))}
    for comb, dim in (("concat", 16), ("sum", 8), ("mean", 8)):
        m = AudioTextAdaptor(target_dim=8, combination=comb)
        variables = m.init(jax.random.PRNGKey(0), feats)
        y = m.apply(variables, feats)
        assert y.shape == (2, dim)
