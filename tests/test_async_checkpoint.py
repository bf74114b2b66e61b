"""Asynchronous (deferred-wait) checkpointing: io/checkpoint.py
save_state(block=False).

The reference saved torch pickles synchronously inside the epoch loop
(reference trainer.py:330-338); here orbax's AsyncCheckpointer snapshots to
host and writes in the background so the save overlaps the next epoch.
These tests pin the safety contract: readers and re-writers of the same
path wait for the in-flight write; donation/mutation of the live state
after save() returns cannot corrupt the snapshot; fit() drains everything.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodalaggressionrecognition_tpu.io import checkpoint as ckpt_io
from multimodalaggressionrecognition_tpu.train import LossSpec
from multimodalaggressionrecognition_tpu.train.state import create_train_state
from multimodalaggressionrecognition_tpu.train.steps import make_train_step

from test_train_features import _tiny_batch, _tiny_model


def _stepped_state(n=1):
    model = _tiny_model()
    batch = _tiny_batch()
    state = create_train_state(model, batch["modalities"], optax.adam(1e-1))
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    for i in range(n):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    return model, batch, state, step


def test_async_save_then_restore_roundtrip(tmp_path):
    model, batch, state, _ = _stepped_state()
    ckpt_io.save_state(str(tmp_path / "ck"), state, meta={"epoch": 0},
                       block=False)
    # restore waits on the in-flight write of the same path
    fresh = create_train_state(model, batch["modalities"], optax.adam(1e-1))
    restored, meta = ckpt_io.restore_state(str(tmp_path / "ck"), fresh)
    assert meta["epoch"] == 0
    np.testing.assert_array_equal(
        np.asarray(restored.params["TorchLinear_0"]["kernel"]),
        np.asarray(state.params["TorchLinear_0"]["kernel"]))
    assert not ckpt_io._inflight  # restore drained it


def test_async_save_snapshot_isolated_from_later_updates(tmp_path):
    """The saved tree is the state AT save() time — training on (and
    mutating device buffers) afterwards must not leak into the write."""
    model, batch, state, step = _stepped_state()
    want = np.asarray(state.params["TorchLinear_0"]["kernel"]).copy()
    ckpt_io.save_state(str(tmp_path / "ck"), state, block=False)
    for i in range(5):  # keep training while the write is in flight
        state, _ = step(state, batch, jax.random.PRNGKey(100 + i))
    ckpt_io.wait_for_saves()
    variables, _ = ckpt_io.restore_variables(str(tmp_path / "ck"))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["TorchLinear_0"]["kernel"]), want)
    assert not np.array_equal(
        np.asarray(state.params["TorchLinear_0"]["kernel"]), want)


def test_async_resave_same_path_keeps_latest(tmp_path):
    """Two deferred saves to one directory serialize (the second waits the
    first); the final content is the second state."""
    model, batch, state, step = _stepped_state()
    ckpt_io.save_state(str(tmp_path / "ck"), state, meta={"epoch": 0},
                       block=False)
    state2, _ = step(state, batch, jax.random.PRNGKey(7))
    ckpt_io.save_state(str(tmp_path / "ck"), state2, meta={"epoch": 1},
                       block=False)
    ckpt_io.wait_for_saves()
    fresh = create_train_state(model, batch["modalities"], optax.adam(1e-1))
    restored, meta = ckpt_io.restore_state(str(tmp_path / "ck"), fresh)
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["TorchLinear_0"]["kernel"]),
        np.asarray(state2.params["TorchLinear_0"]["kernel"]))
