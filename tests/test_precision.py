"""Mixed-precision (bfloat16 compute) tests.

The reference is float32-only; bf16 mixed precision is a TPU-native
capability of the rebuild (utils/precision.py, compute_dtype= on
train/steps.py and serve.Predictor).  These tests check (1) dtype discipline
— activations stay bf16 through the layers, master params / grads / BN
running stats / losses stay f32 — and (2) numerics — bf16 logits track the
f32 logits closely enough to train the same model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalaggressionrecognition_tpu.models.cnn1d import (
    AudioCnn1DExtractorWrapper)
from multimodalaggressionrecognition_tpu.models.layers import (
    MultiheadSelfAttention, TorchLinear, TransformerEncoder)
from multimodalaggressionrecognition_tpu.models.nn1d import BatchNorm1d, Conv1d
from multimodalaggressionrecognition_tpu.train import LossSpec
from multimodalaggressionrecognition_tpu.train.state import create_train_state
from multimodalaggressionrecognition_tpu.train.steps import (
    make_eval_step, make_train_step)
from multimodalaggressionrecognition_tpu.utils.precision import (
    cast_floating, resolve_dtype)


def test_resolve_dtype():
    assert resolve_dtype(None) is None
    assert resolve_dtype("bf16") == jnp.bfloat16
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype("float32") == jnp.float32
    with pytest.raises(ValueError):
        resolve_dtype("fp8")


def test_cast_floating_leaves_ints_alone():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "i": jnp.zeros((3,), jnp.int32)}
    out = cast_floating(tree, "bf16")
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
    assert cast_floating(tree, None) is tree


@pytest.mark.parametrize("module,shape", [
    (TorchLinear(8), (2, 5, 8)),
    (MultiheadSelfAttention(8, 2), (2, 5, 8)),
    (Conv1d(8, 3, stride=1, padding=1), (2, 16, 4)),
    (BatchNorm1d(), (2, 16, 4)),
])
def test_layers_preserve_bf16(module, shape):
    x32 = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                      jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x32)
    y16 = module.apply(variables, x32.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    # f32 path must be bit-identical to before this feature existed: all the
    # added astype() calls are no-ops at f32
    y32 = module.apply(variables, x32)
    assert y32.dtype == jnp.float32


def test_pallas_stem_conv_bf16_roundtrip():
    """Under bf16 the fused Pallas stem runs in f32 with cast in/out
    (framing is f32-tile-shaped; f32 matmuls already use bf16 MXU passes)."""
    conv = Conv1d(8, 160, stride=40, padding=80, use_pallas=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2000)) * 0.1,
                    jnp.float32)[..., None]
    variables = conv.init(jax.random.PRNGKey(0), x)
    y32 = conv.apply(variables, x)
    y16 = conv.apply(cast_floating(variables, "bf16"),
                     x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               atol=0.05)


def test_audio_tower_bf16_tracks_f32():
    model = AudioCnn1DExtractorWrapper(hidden_size=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 20000)) * 0.1, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y32 = model.apply(variables, x)
    y16 = model.apply(cast_floating(variables, "bf16"),
                      x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    diff = np.abs(np.asarray(y16, np.float32) - np.asarray(y32))
    scale = np.abs(np.asarray(y32)).max() + 1e-6
    assert diff.max() / scale < 0.1, diff.max() / scale


def test_transformer_bf16_tracks_f32():
    enc = TransformerEncoder(d_model=32, nhead=4, num_layers=2,
                             dim_feedforward=64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    mask = jnp.zeros((2, 6), bool).at[:, 4:].set(True)
    variables = enc.init(jax.random.PRNGKey(0), x, mask)
    y32 = enc.apply(variables, x, mask)
    y16 = enc.apply(cast_floating(variables, "bf16"),
                    x.astype(jnp.bfloat16), mask)
    assert y16.dtype == jnp.bfloat16
    diff = np.abs(np.asarray(y16, np.float32) - np.asarray(y32))
    assert diff.max() < 0.15, diff.max()


def _tiny_flagship_batch(b=4, audio_len=20000, text_len=6, hidden=32):
    from multimodalaggressionrecognition_tpu.models.fusion import (
        EqualSizedTransformerModalitiesFusion)
    from multimodalaggressionrecognition_tpu.models.physverb import (
        IdentityExtractor, PhysVerbClassifierConcatFeatures, PhysVerbModel)

    model = PhysVerbModel(
        extractors={"audio": AudioCnn1DExtractorWrapper(hidden_size=hidden),
                    "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, hidden, 4),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (hidden, 16), "text": (hidden, 16)}),
        feature_shapes={},
        modalities=("audio", "text"),
    )
    rng = np.random.default_rng(3)
    batch = {
        "modalities": {
            "audio": {"data": rng.standard_normal(
                (b, audio_len)).astype(np.float32) * 0.1,
                "present": np.ones((b,), np.float32)},
            "text": {"data": rng.standard_normal(
                (b, text_len, hidden)).astype(np.float32),
                "present": np.ones((b,), np.float32)},
        },
        "labels": {"phys": (np.arange(b) % 2).astype(np.int32),
                   "verb": np.zeros((b,), np.int32)},
        "label_mask": {"phys": np.ones((b,), np.float32),
                       "verb": np.ones((b,), np.float32)},
        "sample_mask": np.ones((b,), np.float32),
    }
    return model, batch


def test_bf16_train_step_keeps_f32_master_state():
    model, batch = _tiny_flagship_batch()
    state = create_train_state(model, batch["modalities"], optax.adam(1e-3))
    specs = {"phys": LossSpec("ce"), "verb": LossSpec("ce")}
    step16 = make_train_step(model, specs, num_classes=2, donate=False,
                             compute_dtype="bf16")
    step32 = make_train_step(model, specs, num_classes=2, donate=False)

    s16, m16 = step16(state, batch, jax.random.PRNGKey(0))
    s32, m32 = step32(state, batch, jax.random.PRNGKey(0))

    # master params, opt state, BN stats all stay f32
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(s16.opt_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(s16.model_state):
        assert leaf.dtype == jnp.float32
    # losses are finite, f32, and close between precisions on this tiny model
    l16 = float(m16["total_loss"])
    l32 = float(m32["total_loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / (abs(l32) + 1e-6) < 0.05, (l16, l32)
    # one more step runs from the updated state (shapes/dtypes consistent)
    s16b, _ = step16(s16, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.tree.leaves(s16b.params)[0].sum()))


def test_bf16_eval_step_matches_f32_confusion():
    model, batch = _tiny_flagship_batch()
    state = create_train_state(model, batch["modalities"], optax.adam(1e-3))
    specs = {"phys": LossSpec("ce"), "verb": LossSpec("ce")}
    # train a few f32 steps so logits are not at init symmetry
    step = make_train_step(model, specs, num_classes=2, donate=False)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    m32 = make_eval_step(model, specs, 2)(state, batch)
    m16 = make_eval_step(model, specs, 2, compute_dtype="bf16")(state, batch)
    for head in ("phys", "verb"):
        np.testing.assert_array_equal(np.asarray(m32[head]["confusion"]),
                                      np.asarray(m16[head]["confusion"]))


def test_predictor_bf16():
    from multimodalaggressionrecognition_tpu.serve import Predictor

    model, batch = _tiny_flagship_batch()
    variables = model.init(jax.random.PRNGKey(0), batch["modalities"])
    mods = {m: batch["modalities"][m]["data"][:2]
            for m in batch["modalities"]}
    p32 = Predictor(model, variables, batch_size=4).predict(mods)
    p16 = Predictor(model, variables, batch_size=4,
                    compute_dtype="bf16").predict(mods)
    for head in p32:
        assert p16[head].dtype == np.float32
        np.testing.assert_allclose(p16[head], p32[head], atol=0.03)
