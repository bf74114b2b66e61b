"""Tensor-parallel sharding of the fusion encoder on a 4x2 (data x model)
mesh: outputs and one training step match the replicated run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalaggressionrecognition_tpu.parallel import make_mesh
from multimodalaggressionrecognition_tpu.parallel.sharding_rules import (
    place_params, transformer_tp_shardings)


def _encoder_and_input(rng):
    from multimodalaggressionrecognition_tpu.models.layers import TransformerEncoder

    m = TransformerEncoder(d_model=64, nhead=4, num_layers=2,
                           dim_feedforward=128)
    x = jnp.asarray(rng.standard_normal((8, 10, 64)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, x, variables


def test_tp_specs_assigned(rng):
    m, x, variables = _encoder_and_input(rng)
    mesh = make_mesh(data_axis="data", model_axis="model", model_parallelism=2)
    sh = transformer_tp_shardings(variables["params"], mesh)
    layer = sh["layers_0"]
    assert layer["self_attn"]["in_proj_kernel"].spec == P(None, "model")
    assert layer["self_attn"]["out_proj_kernel"].spec == P("model", None)
    assert layer["linear1"]["kernel"].spec == P(None, "model")
    assert layer["linear2"]["kernel"].spec == P("model", None)
    assert layer["norm1"]["scale"].spec == P()


def test_tp_forward_matches_replicated(rng):
    m, x, variables = _encoder_and_input(rng)
    ref = m.apply(variables, x)

    mesh = make_mesh(data_axis="data", model_axis="model", model_parallelism=2)
    params_tp = place_params(variables["params"], mesh)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: m.apply({"params": p}, x))(params_tp, x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_wav2vec2_forward_matches_replicated(rng):
    """The TP rules key off models/layers.TransformerEncoderLayer param
    names, which Wav2Vec2Model reuses — so the reference's largest audio
    extractor family (wav2vec2/HuBERT, up to HuBERT-XL at reference
    train_multimodal.py:176) shards over the `model` axis with no extra
    wiring.  Small-config forward parity TP vs replicated."""
    from multimodalaggressionrecognition_tpu.models.wav2vec import (
        Wav2Vec2Config, Wav2Vec2Model)

    cfg = Wav2Vec2Config(conv_layers=((32, 10, 5), (32, 3, 2)), embed_dim=32,
                         num_layers=2, num_heads=4, ff_dim=64,
                         pos_conv_kernel=16, pos_conv_groups=4)
    m = Wav2Vec2Model(cfg)
    x = jnp.asarray(rng.standard_normal((4, 1600)).astype(np.float32) * 0.1)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(m.apply)(variables, x)

    mesh = make_mesh(data_axis="data", model_axis="model", model_parallelism=2)
    sh = transformer_tp_shardings(variables["params"], mesh)
    layer = sh["layers_0"]
    assert layer["self_attn"]["in_proj_kernel"].spec == P(None, "model")
    assert layer["linear2"]["kernel"].spec == P("model", None)

    params_tp = place_params(variables["params"], mesh)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, xx: m.apply({"params": p}, xx))(params_tp,
                                                            x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_gradients_match_replicated(rng):
    m, x, variables = _encoder_and_input(rng)

    def loss(p, x):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g_ref = jax.grad(loss)(variables["params"], x)

    mesh = make_mesh(data_axis="data", model_axis="model", model_parallelism=2)
    params_tp = place_params(variables["params"], mesh)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss))(params_tp, x_sharded)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)
