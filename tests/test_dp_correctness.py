"""Data-parallel numerical correctness on the virtual 8-device mesh.

Under jit + GSPMD (batch sharded on `data`, params replicated), reductions
over the batch axis are GLOBAL: BatchNorm uses global batch statistics and
gradients equal the single-device values — properties shard_map-style
per-replica code would have to psum by hand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from multimodalaggressionrecognition_tpu.parallel import (
    data_sharding, make_mesh, replicated_sharding, shard_batch)


def _cnn_state_and_batch(rng, b=16):
    from multimodalaggressionrecognition_tpu.models.cnn1d import CNN1D
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import create_train_state
    from multimodalaggressionrecognition_tpu.train.steps import (
        SingleHeadAdapter, make_train_step)

    model = SingleHeadAdapter(inner=CNN1D(2), modality="audio", head="main")
    batch = {
        "modalities": {"audio": {
            "data": rng.standard_normal((b, 20000)).astype(np.float32) * 0.3,
            "present": np.ones((b,), np.float32)}},
        "labels": {"main": (np.arange(b) % 2).astype(np.int32)},
        "label_mask": {"main": np.ones((b,), np.float32)},
        "sample_mask": np.ones((b,), np.float32),
    }
    # SGD so the param delta IS the gradient (Adam's rsqrt amplifies
    # benign reduction-order float noise into +-lr sign flips near zero)
    state = create_train_state(model, batch["modalities"], optax.sgd(1.0))
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    return state, batch, step


@pytest.mark.slow
def test_sharded_step_matches_single_device(rng):
    state, batch, step = _cnn_state_and_batch(rng)
    key = jax.random.PRNGKey(0)

    # single device
    s1, m1 = step(state, jax.tree.map(jnp.asarray, batch), key)

    # 8-way data parallel
    mesh = make_mesh()
    state_r = jax.device_put(state, replicated_sharding(mesh))
    batch_s = shard_batch(batch, mesh)
    s8, m8 = step(state_r, batch_s, key)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["main"]["confusion"]),
                               np.asarray(m8["main"]["confusion"]))
    # params after one SGD update identical => gradients were global
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
    # BatchNorm running stats use GLOBAL batch statistics
    for a, b_ in zip(jax.tree.leaves(s1.model_state),
                     jax.tree.leaves(s8.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5)
