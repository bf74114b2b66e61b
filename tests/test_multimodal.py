"""Fusion + EMPTY-protocol tests for the PhysVerb multimodal model."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.models.audiotext import AudioTextualModel
from multimodalaggressionrecognition_tpu.models.cnn1d import AudioCnn1DExtractorWrapper
from multimodalaggressionrecognition_tpu.models.fusion import (
    AveragedFeaturesTransformerFusion, CrossAttentionFusion,
    EqualSizedTransformerModalitiesFusion, concat_with_bounds, zero_row_mask)
from multimodalaggressionrecognition_tpu.models.heads import TransformerSequenceClassifier
from multimodalaggressionrecognition_tpu.models.physverb import (
    IdentityExtractor, PhysVerbClassifier, PhysVerbClassifierAddFeatures,
    PhysVerbClassifierConcatFeatures, PhysVerbModel)


def test_concat_bounds_sorted_order(rng):
    feats = {
        "video": jnp.ones((2, 16, 8)),
        "audio": jnp.ones((2, 7, 8)),
        "text": jnp.ones((2, 48, 8)),
    }
    concat, bounds = concat_with_bounds(feats)
    assert concat.shape == (2, 71, 8)
    assert bounds == {"audio": (0, 7), "text": (7, 55), "video": (55, 71)}


def test_zero_row_mask_matches_reference_semantics(rng):
    x = np.ones((1, 4, 8), np.float32)
    x[0, 1] = 0.0          # zero row -> masked
    x[0, 2] = 0.5
    x[0, 2, 0] = -3.5      # nonzero rows summing to zero -> ALSO masked
    mask = zero_row_mask(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, True, False]])


def test_fusion_split_shapes(rng):
    feats = {
        "audio": jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32)),
        "text": jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32)),
    }
    for cls in (EqualSizedTransformerModalitiesFusion,
                AveragedFeaturesTransformerFusion, CrossAttentionFusion):
        m = cls(hidden_size=32, num_heads=4) if cls is CrossAttentionFusion else cls(
            num_layers=1, hidden_size=32, num_heads=4)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        out = jax.jit(m.apply)(variables, feats)
        assert set(out) == {"audio", "text"}
        if cls is AveragedFeaturesTransformerFusion:
            assert out["audio"].shape == (2, 1, 32)
        else:
            assert out["audio"].shape == (2, 7, 32)
            assert out["text"].shape == (2, 12, 32)


def _tiny_physverb(with_video_stub=True):
    return PhysVerbModel(
        extractors={"audio": AudioCnn1DExtractorWrapper(hidden_size=32),
                    "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, 32, 4),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (32, 16), "text": (32, 16), "video": (32, 16)}),
        feature_shapes={"video": (4, 32)},
        modalities=("audio", "text", "video") if with_video_stub else ("audio", "text"),
    )


def _batch(rng, b=2, present_audio=1.0):
    return {
        "audio": {"data": jnp.asarray(rng.standard_normal((b, 80000)).astype(np.float32)),
                  "present": jnp.full((b,), present_audio, jnp.float32)},
        "text": {"data": jnp.asarray(rng.standard_normal((b, 48, 32)).astype(np.float32)),
                 "present": jnp.ones((b,), jnp.float32)},
    }


def test_physverb_forward_and_heads(rng):
    model = _tiny_physverb()
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    assert set(out) == {"phys", "verb"}
    assert out["phys"].shape == (2, 2) and out["verb"].shape == (2, 2)
    assert np.isfinite(np.asarray(out["phys"])).all()
    assert model.head_names() == ["verb", "phys"] or set(model.head_names()) == {"phys", "verb"}


def test_empty_mask_equals_absent_modality(rng):
    """present-mask=0 must equal the reference's zero-stub for an absent row."""
    model = _tiny_physverb()
    batch = _batch(rng, b=1, present_audio=1.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    masked = dict(batch)
    masked["audio"] = {"data": batch["audio"]["data"],
                       "present": jnp.zeros((1,), jnp.float32)}
    out_masked = jax.jit(model.apply)(variables, masked)

    # absent entirely: replace audio with an explicit zero feature stub
    model_absent = PhysVerbModel(
        extractors={"text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, 32, 4),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (32, 16), "text": (32, 16), "video": (32, 16)}),
        feature_shapes={"video": (4, 32), "audio": (7, 32)},
        modalities=("audio", "text", "video"),
    )
    out_absent = jax.jit(model_absent.apply)(variables, {"text": masked["text"]})
    for k in out_masked:
        np.testing.assert_allclose(np.asarray(out_masked[k]),
                                   np.asarray(out_absent[k]), atol=1e-5)


@pytest.mark.slow
def test_physverb_gradients_flow(rng):
    model = _tiny_physverb()
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0]
        return sum(jnp.sum(v ** 2) for v in out.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_classifier_variants(rng):
    feats = {"audio": jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32)),
             "text": jnp.asarray(rng.standard_normal((2, 48, 32)).astype(np.float32)),
             "video": jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))}
    sizes = {"audio": (32, 16), "text": (32, 16), "video": (32, 16)}
    for cls in (PhysVerbClassifier, PhysVerbClassifierConcatFeatures,
                PhysVerbClassifierAddFeatures):
        m = cls(class_num=2, adaptor_sizes=sizes)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        out = jax.jit(m.apply)(variables, feats)
        assert set(out) == {"phys", "verb"}
        assert all(v.shape == (2, 2) for v in out.values())


def test_audio_textual_model(rng):
    model = AudioTextualModel(
        audio_extractor=AudioCnn1DExtractorWrapper(hidden_size=64),
        text_extractor=TransformerSequenceClassifier(
            class_num=2, hidden_size=64, num_layers=1, num_heads=4),
        hidden_size=64, class_num=2)
    # text tower must return features, not logits -> wrap via return_type
    batch = {
        "audio": {"data": jnp.asarray(rng.standard_normal((2, 80000)).astype(np.float32))},
        "text": {"data": jnp.asarray(rng.standard_normal((2, 48, 64)).astype(np.float32))},
    }

    class TextFeatures(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, x, train=False):
            return self.inner(x, train=train, return_type="features")

    model = AudioTextualModel(
        audio_extractor=AudioCnn1DExtractorWrapper(hidden_size=64),
        text_extractor=TextFeatures(TransformerSequenceClassifier(
            class_num=2, hidden_size=64, num_layers=1, num_heads=4)),
        hidden_size=64, class_num=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    assert out.shape == (2, 2)
