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
