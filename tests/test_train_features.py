"""Production-training features beyond the reference's plain Adam
(reference trainer.py:370-373): LR warmup, global-norm clipping, gradient
accumulation, parameter EMA, and early stopping."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalaggressionrecognition_tpu.cli.common import (TrainConfig,
                                                            make_optimizer)


def _tree(seed=0, shape=(4, 4)):
    rng = np.random.default_rng(seed)
    return {"w": jnp.asarray(rng.standard_normal(shape), jnp.float32)}


def test_warmup_starts_at_zero_lr():
    cfg = TrainConfig(learning_rate=1e-2, warmup_steps=100)
    tx = make_optimizer(cfg)
    params = _tree()
    state = tx.init(params)
    updates, _ = tx.update(jax.tree.map(jnp.ones_like, params), state, params)
    warm0 = float(optax.global_norm(updates))

    plain = make_optimizer(TrainConfig(learning_rate=1e-2))
    updates_p, _ = plain.update(jax.tree.map(jnp.ones_like, params),
                                plain.init(params), params)
    assert warm0 < 0.01 * float(optax.global_norm(updates_p))


def test_grad_clipping_changes_updates():
    params = _tree()
    g_big = jax.tree.map(lambda x: jnp.ones_like(x) * 1e3, params)
    g_small = jax.tree.map(jnp.ones_like, params)

    def two_steps(cfg):
        tx = make_optimizer(cfg)
        s = tx.init(params)
        u1, s = tx.update(g_big, s, params)
        p = optax.apply_updates(params, u1)
        u2, s = tx.update(g_small, s, p)
        return optax.apply_updates(p, u2)

    clipped = two_steps(TrainConfig(learning_rate=1e-2, grad_clip_norm=1.0))
    plain = two_steps(TrainConfig(learning_rate=1e-2))
    # Adam is scale-invariant for constant grads, but the big->small scale
    # change makes clipped second moments diverge from unclipped ones.
    assert not np.allclose(np.asarray(clipped["w"]), np.asarray(plain["w"]))


def test_weight_decay_is_adamw():
    cfg = TrainConfig(learning_rate=1e-2, weight_decay=0.1)
    tx = make_optimizer(cfg)
    params = _tree()
    zeros = jax.tree.map(jnp.zeros_like, params)
    u, _ = tx.update(zeros, tx.init(params), params)
    # zero grads: AdamW still shrinks params toward 0 (decoupled decay)
    expect = -cfg.learning_rate * cfg.weight_decay * np.asarray(params["w"])
    np.testing.assert_allclose(np.asarray(u["w"]), expect, atol=1e-7)


def test_grad_accumulation_matches_mean_gradient():
    cfg = TrainConfig(learning_rate=1e-2, grad_accum_steps=2)
    tx = make_optimizer(cfg)
    params = _tree()
    s = tx.init(params)
    g1 = _tree(seed=1)
    g2 = _tree(seed=2)

    u1, s = tx.update(g1, s, params)
    assert float(optax.global_norm(u1)) == 0.0  # no update mid-accumulation
    u2, s = tx.update(g2, s, params)
    accum = optax.apply_updates(params, u2)

    ref_tx = make_optimizer(TrainConfig(learning_rate=1e-2))
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    ru, _ = ref_tx.update(g_mean, ref_tx.init(params), params)
    ref = optax.apply_updates(params, ru)
    np.testing.assert_allclose(np.asarray(accum["w"]), np.asarray(ref["w"]),
                               rtol=1e-6)


# ---------------------------------------------------------------------- EMA

def _tiny_model():
    import flax.linen as nn

    from multimodalaggressionrecognition_tpu.models.layers import TorchLinear

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    return M()


def _tiny_batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return {"modalities": {"x": {"data": jnp.asarray(
                rng.standard_normal((b, 8)), jnp.float32)}},
            "labels": {"main": jnp.asarray(np.arange(b) % 2, jnp.int32)},
            "label_mask": {"main": jnp.ones((b,))},
            "sample_mask": jnp.ones((b,))}


def test_ema_tracks_recursion_and_eval_uses_it():
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import (
        make_eval_step, make_train_step)

    model = _tiny_model()
    batch = _tiny_batch()
    decay = 0.8
    state = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                               ema_decay=decay)
    np.testing.assert_allclose(
        np.asarray(state.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(state.params["TorchLinear_0"]["kernel"]))

    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    ema_manual = state.ema_params
    for i in range(3):
        new_state, _ = step(state, batch, jax.random.PRNGKey(i))
        ema_manual = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                                  ema_manual, new_state.params)
        state = new_state
    np.testing.assert_allclose(
        np.asarray(state.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(ema_manual["TorchLinear_0"]["kernel"]), rtol=1e-6)
    # EMA lags behind the live params after real updates
    assert not np.allclose(
        np.asarray(state.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(state.params["TorchLinear_0"]["kernel"]))

    # eval runs on the EMA shadow, not the live params
    ev = make_eval_step(model, {"main": LossSpec("ce")}, num_classes=2)
    got = ev(state, batch)
    want = model.apply({"params": state.ema_params}, batch["modalities"])
    live = model.apply({"params": state.params}, batch["modalities"])
    # reconstruct the eval loss from the ema forward to confirm which was used
    from multimodalaggressionrecognition_tpu.ops.losses import cross_entropy

    want_loss = cross_entropy(want["main"], batch["labels"]["main"],
                              batch["label_mask"]["main"])
    live_loss = cross_entropy(live["main"], batch["labels"]["main"],
                              batch["label_mask"]["main"])
    assert np.asarray(got["main"]["loss"]) == pytest.approx(
        float(want_loss), rel=1e-5)
    assert float(want_loss) != pytest.approx(float(live_loss), rel=1e-5)


def test_ema_checkpoint_roundtrip(tmp_path):
    from multimodalaggressionrecognition_tpu.io import checkpoint as ckpt_io
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    model = _tiny_model()
    batch = _tiny_batch()
    state = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                               ema_decay=0.9)
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    ckpt_io.save_state(str(tmp_path / "ck"), state, meta={"epoch": 0})

    fresh = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                               ema_decay=0.9)
    restored, _ = ckpt_io.restore_state(str(tmp_path / "ck"), fresh)
    np.testing.assert_allclose(
        np.asarray(restored.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(state.ema_params["TorchLinear_0"]["kernel"]))

    # EMA checkpoint loads into a plain template (predict/evaluate path)
    # and serves the EMA shadow through eval_params
    plain = create_train_state(model, batch["modalities"], optax.adam(1e-1))
    r2, _ = ckpt_io.restore_state(str(tmp_path / "ck"), plain)
    np.testing.assert_allclose(
        np.asarray(r2.eval_params["TorchLinear_0"]["kernel"]),
        np.asarray(state.ema_params["TorchLinear_0"]["kernel"]))

    # plain checkpoint loads into an EMA template (resume with --ema_decay
    # newly enabled): shadow seeded from the restored params
    ckpt_io.save_state(str(tmp_path / "plain_ck"), plain)
    t_ema = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                               ema_decay=0.9)
    r3, _ = ckpt_io.restore_state(str(tmp_path / "plain_ck"), t_ema)
    np.testing.assert_allclose(
        np.asarray(r3.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(r3.params["TorchLinear_0"]["kernel"]))


def test_ema_with_donation_no_alias():
    """ema_params must be real copies of params: both are donated by the
    default train step, and aliased buffers would be donated twice."""
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    model = _tiny_model()
    batch = _tiny_batch()
    state = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                               ema_decay=0.9)
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=True)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


# -------------------------------------------------------------- early stop

def test_early_stopping_breaks_fit(tmp_path):
    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    batches = [_tiny_batch(seed=s) for s in range(2)]
    # lr=0: epoch 0 sets the first best, nothing ever improves again
    t = Trainer(_tiny_model(), {"main": LossSpec("ce")}, optax.sgd(0.0),
                batches, batches, num_classes=2, saving_dir=str(tmp_path),
                model_name="es", checkpoint_criterion="loss",
                log_console=False, early_stop_patience=2)
    t.fit(10)
    epochs_run = len(t.logs["main_test"])
    assert epochs_run == 3  # epoch 0 best + 2 flat epochs -> stop


def test_default_optimizer_state_structure_is_plain_adam():
    """The default config must produce the same opt_state pytree as plain
    optax.adam: a constant_schedule wrapper would add a count leaf and break
    restore against pre-existing checkpoints and inference templates."""
    params = _tree()
    got = make_optimizer(TrainConfig()).init(params)
    want = optax.adam(1e-3).init(params)
    assert (jax.tree_util.tree_structure(got)
            == jax.tree_util.tree_structure(want))


def test_schedule_checkpoint_restores_into_plain_adam_template(tmp_path):
    """A checkpoint trained with an LR schedule (different opt_state
    structure) still restores into a plain-Adam template: model tensors
    load, optimizer state is reinitialized with a meta note."""
    from multimodalaggressionrecognition_tpu.io import checkpoint as ckpt_io
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)

    model = _tiny_model()
    batch = _tiny_batch()
    sched_tx = make_optimizer(TrainConfig(lr_schedule="cosine",
                                          warmup_steps=5))
    s = create_train_state(model, batch["modalities"], sched_tx)
    ckpt_io.save_state(str(tmp_path / "ck"), s, meta={"epoch": 3})

    plain = create_train_state(model, batch["modalities"], optax.adam(1e-3))
    restored, meta = ckpt_io.restore_state(str(tmp_path / "ck"), plain)
    np.testing.assert_allclose(
        np.asarray(restored.params["TorchLinear_0"]["kernel"]),
        np.asarray(s.params["TorchLinear_0"]["kernel"]))
    assert meta["epoch"] == 3
    assert "reinitialized" in meta.get("optimizer_state", "")


def test_restore_variables_serves_ema(tmp_path):
    from multimodalaggressionrecognition_tpu.io import checkpoint as ckpt_io
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    model = _tiny_model()
    batch = _tiny_batch()
    s = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                           ema_decay=0.9)
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    s, _ = step(s, batch, jax.random.PRNGKey(0))
    ckpt_io.save_state(str(tmp_path / "ck"), s)
    variables, _ = ckpt_io.restore_variables(str(tmp_path / "ck"))
    np.testing.assert_allclose(
        np.asarray(variables["params"]["TorchLinear_0"]["kernel"]),
        np.asarray(s.ema_params["TorchLinear_0"]["kernel"]))


def test_resume_without_ema_flag_keeps_shadow(tmp_path):
    """Resuming an EMA run with a template that forgot --ema_decay must not
    let the first step overwrite the restored shadow: the saved decay is
    picked up from checkpoint meta."""
    from multimodalaggressionrecognition_tpu.io import checkpoint as ckpt_io
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    model = _tiny_model()
    batch = _tiny_batch()
    s = create_train_state(model, batch["modalities"], optax.adam(1e-1),
                           ema_decay=0.9)
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    s, _ = step(s, batch, jax.random.PRNGKey(0))
    ckpt_io.save_state(str(tmp_path / "ck"), s)

    forgot = create_train_state(model, batch["modalities"], optax.adam(1e-1))
    restored, _ = ckpt_io.restore_state(str(tmp_path / "ck"), forgot)
    assert restored.ema_decay == pytest.approx(0.9)
    after, _ = step(restored, batch, jax.random.PRNGKey(1))
    # shadow still lags the live params (decay 0.0 would have snapped to them)
    assert not np.allclose(
        np.asarray(after.ema_params["TorchLinear_0"]["kernel"]),
        np.asarray(after.params["TorchLinear_0"]["kernel"]))


def test_ema_with_grad_accumulation_decays_once_per_update():
    """With accumulation k, the EMA shadow must decay once per OPTIMIZER
    update, not once per micro-step (decay^k would shrink the horizon)."""
    from multimodalaggressionrecognition_tpu.train import LossSpec
    from multimodalaggressionrecognition_tpu.train.state import (
        create_train_state)
    from multimodalaggressionrecognition_tpu.train.steps import make_train_step

    model = _tiny_model()
    batch = _tiny_batch()
    k, decay = 2, 0.8
    tx = make_optimizer(TrainConfig(learning_rate=1e-1, grad_accum_steps=k))
    s = create_train_state(model, batch["modalities"], tx, ema_decay=decay,
                           ema_update_every=k)
    step = make_train_step(model, {"main": LossSpec("ce")}, num_classes=2,
                           donate=False)
    ema0 = np.asarray(s.ema_params["TorchLinear_0"]["kernel"])
    s, _ = step(s, batch, jax.random.PRNGKey(0))   # micro-step 1: no update
    np.testing.assert_allclose(
        np.asarray(s.ema_params["TorchLinear_0"]["kernel"]), ema0)
    s, _ = step(s, batch, jax.random.PRNGKey(1))   # micro-step 2: update
    expect = decay * ema0 + (1 - decay) * np.asarray(
        s.params["TorchLinear_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(s.ema_params["TorchLinear_0"]["kernel"]), expect,
        rtol=1e-6)
