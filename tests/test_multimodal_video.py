"""Full tri-modal PhysVerb path with the windowed Swin3D-T video tower.

Exercises the train_multimodal configuration with video enabled (the
reference's full configuration, train_multimodal.py:335) on tiny shapes:
both heads receive labels, one train step runs, gradients are finite and the
frozen video tower's parameters receive zero gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from multimodalaggressionrecognition_tpu.cli.train_multimodal import (
    MultimodalConfig, build_model)
from multimodalaggressionrecognition_tpu.train import LossSpec
from multimodalaggressionrecognition_tpu.train.state import create_train_state
from multimodalaggressionrecognition_tpu.train.steps import make_train_step


@pytest.mark.slow
def test_trimodal_train_step(rng):
    cfg = MultimodalConfig(
        hidden_size=768, audio_samples=16000, text_tokens=8,
        video_frames=8, video_size=32, video_window=4, batch_size=2)
    model = build_model(cfg, ("audio", "text", "video"))
    b = 2
    modalities = {
        "audio": {"data": jnp.asarray(rng.standard_normal((b, 16000)).astype(np.float32) * 0.1),
                  "present": jnp.ones((b,), jnp.float32)},
        "text": {"data": jnp.asarray(rng.standard_normal((b, 8, 768)).astype(np.float32)),
                 "present": jnp.ones((b,), jnp.float32)},
        "video": {"data": jnp.asarray(rng.standard_normal((b, 8, 32, 32, 3)).astype(np.float32) * 0.3),
                  "present": jnp.ones((b,), jnp.float32)},
    }
    batch = {
        "modalities": modalities,
        "labels": {"phys": jnp.asarray([0, 1], jnp.int32),
                   "verb": jnp.asarray([1, 0], jnp.int32)},
        "label_mask": {"phys": jnp.ones((b,), jnp.float32),
                       "verb": jnp.ones((b,), jnp.float32)},
        "sample_mask": jnp.ones((b,), jnp.float32),
    }
    state = create_train_state(model, modalities, optax.adam(1e-3))
    step = make_train_step(
        model, {"phys": LossSpec("focal", class_weights=(0.5, 0.5)),
                "verb": LossSpec("ce")}, num_classes=2, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert set(metrics) == {"phys", "verb", "total_loss"}

    # frozen video backbone: parameters unchanged after the update
    old_swin = jax.tree.leaves(
        state.params["extractors_video"])
    new_swin = jax.tree.leaves(
        new_state.params["extractors_video"])
    for a, c in zip(old_swin, new_swin):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
@pytest.mark.parametrize("remat_policy", ["none", "dots"])
def test_trimodal_finetune_unfrozen_swin(rng, remat_policy):
    """--video_freeze False: the Swin tower trains (remat on, fused-attention
    flash backward on TPU / interpret elsewhere) — every backbone parameter
    moves after one step and gradients are finite.  Covers both
    --video_remat_policy values (save-nothing and dots-saveable)."""
    cfg = MultimodalConfig(
        hidden_size=768, audio_samples=16000, text_tokens=8,
        video_frames=8, video_size=32, video_window=4, batch_size=2,
        video_freeze=False, video_remat_policy=remat_policy)
    model = build_model(cfg, ("audio", "text", "video"))
    b = 2
    modalities = {
        "audio": {"data": jnp.asarray(rng.standard_normal((b, 16000)).astype(np.float32) * 0.1),
                  "present": jnp.ones((b,), jnp.float32)},
        "text": {"data": jnp.asarray(rng.standard_normal((b, 8, 768)).astype(np.float32)),
                 "present": jnp.ones((b,), jnp.float32)},
        "video": {"data": jnp.asarray(rng.standard_normal((b, 8, 32, 32, 3)).astype(np.float32) * 0.3),
                  "present": jnp.ones((b,), jnp.float32)},
    }
    batch = {
        "modalities": modalities,
        "labels": {"phys": jnp.asarray([0, 1], jnp.int32),
                   "verb": jnp.asarray([1, 0], jnp.int32)},
        "label_mask": {"phys": jnp.ones((b,), jnp.float32),
                       "verb": jnp.ones((b,), jnp.float32)},
        "sample_mask": jnp.ones((b,), jnp.float32),
    }
    state = create_train_state(model, modalities, optax.adam(1e-2))
    step = make_train_step(
        model, {"phys": LossSpec("ce"), "verb": LossSpec("ce")},
        num_classes=2, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))

    moved = [
        float(jnp.max(jnp.abs(a - c))) for a, c in zip(
            jax.tree.leaves(state.params["extractors_video"]),
            jax.tree.leaves(new_state.params["extractors_video"]))]
    assert all(m > 0.0 for m in moved), \
        f"{sum(m == 0 for m in moved)} backbone params did not train"
