"""Trainer internals: best-checkpoint rules, accumulation, prefetch errors,
and the golden architecture spec from the reference printouts (1.txt)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _mini_trainer(tmp_path, criterion):
    import flax.linen as nn

    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            from multimodalaggressionrecognition_tpu.models.layers import TorchLinear

            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    return Trainer(M(), {"main": LossSpec("ce")}, optax.adam(1e-2),
                   [], [], num_classes=2, saving_dir=str(tmp_path),
                   model_name="mini", checkpoint_criterion=criterion,
                   log_console=False)


def _results(loss, uar):
    return {"main": {"loss": loss, "accuracy": 0.5, "UAR": uar, "UAP": 0.5,
                     "UAF1": 0.5, "precision": np.zeros(2),
                     "recall": np.zeros(2), "f1": np.zeros(2)}}


def test_best_checkpoint_loss_criterion(tmp_path):
    """The reference's inverted best-loss init meant loss-criterion runs never
    checkpointed (reference trainer.py:92-104); here they do."""
    t = _mini_trainer(tmp_path, "loss")
    batch = {"modalities": {"x": {"data": jnp.ones((2, 4))}},
             "labels": {"main": jnp.zeros((2,), jnp.int32)},
             "label_mask": {"main": jnp.ones((2,))},
             "sample_mask": jnp.ones((2,))}
    t.init_state(batch)
    t.maybe_save_best(0, _results(1.0, 0.5))
    assert t.best_errors["main"] == 1.0
    t.maybe_save_best(1, _results(0.5, 0.5))
    assert t.best_errors["main"] == 0.5
    t.maybe_save_best(2, _results(0.7, 0.5))
    assert t.best_errors["main"] == 0.5  # no regression saved


def test_best_checkpoint_uar_criterion(tmp_path):
    t = _mini_trainer(tmp_path, "UAR")
    batch = {"modalities": {"x": {"data": jnp.ones((2, 4))}},
             "labels": {"main": jnp.zeros((2,), jnp.int32)},
             "label_mask": {"main": jnp.ones((2,))},
             "sample_mask": jnp.ones((2,))}
    t.init_state(batch)
    t.maybe_save_best(0, _results(1.0, 0.6))
    t.maybe_save_best(1, _results(1.0, 0.8))
    assert t.best_errors["main"] == pytest.approx(0.2)


def test_accumulation_weighted_by_valid(tmp_path):
    t = _mini_trainer(tmp_path, "UAR")
    acc = {}
    m1 = {"h": {"loss": jnp.asarray(1.0), "valid": jnp.asarray(4.0),
                "confusion": jnp.eye(2) * 2}}
    m2 = {"h": {"loss": jnp.asarray(2.0), "valid": jnp.asarray(2.0),
                "confusion": jnp.eye(2)}}
    acc = t._accumulate(acc, m1)
    acc = t._accumulate(acc, m2)
    results = t._epoch_results(acc)
    # weighted mean: (1*4 + 2*2) / 6
    assert results["h"]["loss"] == pytest.approx(8 / 6)
    assert results["h"]["accuracy"] == pytest.approx(1.0)


def test_async_checkpoint_drained_on_midrun_exception(tmp_path):
    """An exception mid-run must still drain the previous epoch's async
    checkpoint write: orbax force=True deletes the old committed dir before
    the background thread commits the new one, so an abandoned write would
    leave NO restorable state (train/loop.py _fit finally)."""
    import flax.linen as nn
    import os

    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            from multimodalaggressionrecognition_tpu.models.layers import (
                TorchLinear)

            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    batch = {"modalities": {"x": {"data": np.ones((2, 4), np.float32),
                                  "present": np.ones((2,), np.float32)}},
             "labels": {"main": np.zeros((2,), np.int32)},
             "label_mask": {"main": np.ones((2,), np.float32)},
             "sample_mask": np.ones((2,), np.float32)}

    def boom(epoch):
        if epoch == 1:
            raise RuntimeError("mid-run failure")

    t = Trainer(M(), {"main": LossSpec("ce")}, optax.adam(1e-2),
                [batch], [batch], num_classes=2, saving_dir=str(tmp_path),
                model_name="drain", run_dir=str(tmp_path / "run"),
                log_console=False, async_checkpoint=True,
                on_epoch_start=boom)
    with pytest.raises(RuntimeError, match="mid-run failure"):
        t.fit(2)
    # epoch 0's (async) checkpoint_current must be fully committed
    run = str(tmp_path / "run")
    assert os.path.isdir(os.path.join(run, "checkpoint_current", "state"))
    t2 = Trainer(M(), {"main": LossSpec("ce")}, optax.adam(1e-2),
                 [batch], [batch], num_classes=2, saving_dir=str(tmp_path),
                 model_name="drain", run_dir=run, log_console=False)
    meta = t2.resume_latest()
    assert meta is not None and int(meta["epoch"]) == 0


@pytest.mark.slow
def test_tensorboard_scalars_written(tmp_path):
    """--tensorboard_dir writes per-epoch <head>/<split>/<metric> scalar
    events next to the CSV logs (utils/tblog.py)."""
    import glob
    import os

    import flax.linen as nn
    import optax as _optax

    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            from multimodalaggressionrecognition_tpu.models.layers import (
                TorchLinear)

            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    batch = {"modalities": {"x": {"data": np.ones((2, 4), np.float32),
                                  "present": np.ones((2,), np.float32)}},
             "labels": {"main": np.zeros((2,), np.int32)},
             "label_mask": {"main": np.ones((2,), np.float32)},
             "sample_mask": np.ones((2,), np.float32)}
    tb = str(tmp_path / "tb")
    t = Trainer(M(), {"main": LossSpec("ce")}, _optax.adam(1e-2),
                [batch], [batch], num_classes=2, saving_dir=str(tmp_path),
                model_name="tb", run_dir=str(tmp_path / "run"),
                log_console=False, tensorboard_dir=tb)
    t.fit(1)
    events = glob.glob(os.path.join(tb, "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(events[0]) > 0


def test_device_prefetch_propagates_errors():
    from multimodalaggressionrecognition_tpu.data.pipeline import device_prefetch

    def bad_iter():
        yield {"a": np.ones(3)}
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(device_prefetch(bad_iter()))


def test_sampler_deterministic_per_seed():
    from multimodalaggressionrecognition_tpu.data import AggrBatchSampler

    types = np.array(["verb", "phys"] * 10)
    a = list(AggrBatchSampler(types, 4, shuffle=True, seed=7))
    b = list(AggrBatchSampler(types, 4, shuffle=True, seed=7))
    assert a == b
    c = list(AggrBatchSampler(types, 4, shuffle=True, seed=8))
    assert a != c


def test_golden_architecture_shapes_1txt(rng):
    """Parameter shapes of the audio+text PhysVerb configuration match the
    reference's printed architecture (reference 1.txt: adaptors Linear(768,
    256), heads Linear(512, 170) -> Linear(170, 2))."""
    from multimodalaggressionrecognition_tpu.models.cnn1d import (
        AudioCnn1DExtractorWrapper)
    from multimodalaggressionrecognition_tpu.models.fusion import (
        EqualSizedTransformerModalitiesFusion)
    from multimodalaggressionrecognition_tpu.models.physverb import (
        IdentityExtractor, PhysVerbClassifierConcatFeatures, PhysVerbModel)

    model = PhysVerbModel(
        extractors={"audio": AudioCnn1DExtractorWrapper(hidden_size=768),
                    "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, 768, 8),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (768, 256), "text": (768, 256)}),
        feature_shapes={}, modalities=("audio", "text"))
    batch = {
        "audio": {"data": jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32)),
                  "present": jnp.ones((1,))},
        "text": {"data": jnp.asarray(rng.standard_normal((1, 48, 768)).astype(np.float32)),
                 "present": jnp.ones((1,))},
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    clf = variables["params"]["classifier"]
    assert clf["adaptor_audio"]["kernel"].shape == (768, 256)
    assert clf["adaptor_text"]["kernel"].shape == (768, 256)
    assert clf["head_phys_fc1"]["kernel"].shape == (512, 170)  # 512 // 3
    assert clf["head_phys_fc2"]["kernel"].shape == (170, 2)
    assert clf["head_verb_fc1"]["kernel"].shape == (512, 170)
    # fusion encoder: d_model 768, ff 2048 (torch default)
    enc = variables["params"]["fusion"]["encoder"]["layers_0"]
    assert enc["self_attn"]["in_proj_kernel"].shape == (768, 2304)
    assert enc["linear1"]["kernel"].shape == (768, 2048)


def test_resumed_partial_epoch_reports_whole_epoch_time(tmp_path):
    """epoch_seconds/clips_per_sec on a resumed partial epoch cover the
    WHOLE epoch (pre-preemption seconds carried in the snapshot), not just
    the post-resume remainder — an eval-preempted partial (zero steps left)
    would otherwise log a near-infinite throughput as if trained."""
    import flax.linen as nn

    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            from multimodalaggressionrecognition_tpu.models.layers import (
                TorchLinear)

            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    rng = np.random.default_rng(0)
    batches = [{
        "modalities": {"x": {"data":
                             rng.standard_normal((4, 4)).astype(np.float32)}},
        "labels": {"main": np.zeros((4,), np.int32)},
        "label_mask": {"main": np.ones((4,), np.float32)},
        "sample_mask": np.ones((4,), np.float32),
    } for _ in range(2)]
    t = Trainer(M(), {"main": LossSpec("ce")}, optax.sgd(0.1), batches,
                batches, num_classes=2, saving_dir=str(tmp_path),
                model_name="mini", log_console=False)

    results, snap = t.train_epoch(jax.random.PRNGKey(0))
    assert snap["seconds"] > 0
    # pretend the pre-preemption pass took 100 s, then resume with the
    # full epoch already trained (the eval-preempt shape: zero steps left)
    partial = dict(snap, seconds=100.0)
    results2, snap2 = t.train_epoch(jax.random.PRNGKey(0), partial=partial)
    assert snap2["batches_done"] == snap["batches_done"]
    assert snap2["samples"] == snap["samples"]
    assert snap2["seconds"] >= 100.0
    for m in results2.values():
        assert m["epoch_seconds"] >= 100.0
        assert m["clips_per_sec"] <= snap["samples"] / 100.0 + 1e-6


def test_run_lock_excludes_live_owner_reclaims_dead(tmp_path):
    """utils/runlock (flock-based): a live owner in another process blocks
    (SystemExit); a dead owner's leftover lock file does not (the kernel
    dropped its flock at exit); same-process re-acquire is re-entrant; and
    release hands the lock to the next process."""
    import os
    import subprocess
    import sys
    import textwrap

    import pytest

    from multimodalaggressionrecognition_tpu.utils.runlock import (
        acquire_run_lock)

    d = str(tmp_path)
    helper = textwrap.dedent("""
        import sys
        from multimodalaggressionrecognition_tpu.utils.runlock import (
            acquire_run_lock)
        try:
            acquire_run_lock(sys.argv[1])
        except SystemExit as e:
            print("BLOCKED", e)
            sys.exit(3)
        print("ACQUIRED", flush=True)
        if len(sys.argv) > 2 and sys.argv[2] == "hold":
            sys.stdin.readline()  # hold the flock until the parent says so
    """)

    # dead owner: the helper acquires and exits -> its flock is gone even
    # though the lock FILE remains; we must acquire cleanly
    subprocess.run([sys.executable, "-c", helper, d], check=True,
                   env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert (tmp_path / ".runlock.p0").exists()
    release = acquire_run_lock(d)

    # re-entrant: a second acquire in this process is the same lock
    assert acquire_run_lock(d) is release

    # live owner (us) blocks another process
    probe = subprocess.run([sys.executable, "-c", helper, d],
                           capture_output=True, text=True,
                           env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert probe.returncode == 3 and "locked by live trainer" in probe.stdout

    # and it blocks us no longer once released
    release()
    probe = subprocess.run([sys.executable, "-c", helper, d],
                           capture_output=True, text=True,
                           env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert probe.returncode == 0, probe.stdout + probe.stderr

    # a holding process blocks us, then its exit unblocks
    holder = subprocess.Popen([sys.executable, "-c", helper, d, "hold"],
                              stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                              text=True,
                              env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert holder.stdout.readline().strip() == "ACQUIRED"
    with pytest.raises(SystemExit, match="locked by live trainer"):
        acquire_run_lock(d)
    holder.stdin.write("done\n")
    holder.stdin.close()
    holder.wait()
    acquire_run_lock(d)()  # acquire + release cleanly


class _NpProxy:
    """Counts np.asarray calls made through a module's `np` binding."""

    def __init__(self):
        self.asarray_calls = 0

    def asarray(self, *a, **k):
        self.asarray_calls += 1
        return np.asarray(*a, **k)

    def __getattr__(self, name):
        return getattr(np, name)


def _loop_trainer(tmp_path, batches):
    import flax.linen as nn

    from multimodalaggressionrecognition_tpu.train import LossSpec, Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, modalities, train=False):
            from multimodalaggressionrecognition_tpu.models.layers import (
                TorchLinear)

            return {"main": TorchLinear(2)(modalities["x"]["data"])}

    return Trainer(M(), {"main": LossSpec("ce")}, optax.sgd(0.1), batches,
                   batches, num_classes=2, saving_dir=str(tmp_path),
                   model_name="mini", log_console=False)


def _np_batches(n):
    rng = np.random.default_rng(0)
    return [{
        "modalities": {"x": {"data":
                             rng.standard_normal((4, 4)).astype(np.float32)}},
        "labels": {"main": (np.arange(4) % 2).astype(np.int32)},
        "label_mask": {"main": np.ones((4,), np.float32)},
        "sample_mask": np.ones((4,), np.float32),
    } for _ in range(n)]


def test_epoch_loop_is_readback_free(tmp_path, monkeypatch):
    """The epoch loops must not host-sync per step: metric/sample
    accumulation runs on device (loop._acc_step) and host readbacks
    (np.asarray on device arrays) happen only at epoch/snapshot
    boundaries — so their count is INDEPENDENT of the batch count.
    The old host-numpy accumulation was a blocking D2H readback per
    step, serializing every step behind a full dispatch round trip."""
    from multimodalaggressionrecognition_tpu.train import loop as loop_mod

    counts = {}
    for n in (2, 8):
        proxy = _NpProxy()
        monkeypatch.setattr(loop_mod, "np", proxy)
        try:
            t = _loop_trainer(tmp_path / f"n{n}", _np_batches(n))
            results, snap = t.train_epoch(jax.random.PRNGKey(0))
        finally:
            monkeypatch.setattr(loop_mod, "np", np)
        assert snap["samples"] == 4 * n
        assert snap["batches_done"] == n
        assert "main" in results
        counts[n] = proxy.asarray_calls
    assert counts[8] == counts[2], (
        f"per-step host readbacks crept back into the epoch loop: "
        f"{counts[2]} asarray calls @2 batches vs {counts[8]} @8")


def test_device_accumulation_matches_host_math(tmp_path):
    """Device-side _acc_step reproduces the host-numpy accumulation it
    replaced: weighted loss mean, valid counts, confusion sums, and the
    masked sample count."""
    t = _mini_trainer(tmp_path, "UAR")
    m1 = {"h": {"loss": jnp.asarray(1.0), "valid": jnp.asarray(4.0),
                "confusion": jnp.eye(2) * 2},
          "total_loss": jnp.asarray(9.9)}
    m2 = {"h": {"loss": jnp.asarray(2.0), "valid": jnp.asarray(2.0),
                "confusion": jnp.eye(2)}}
    acc = t._accumulate({}, m1, sample_mask=jnp.asarray([1.0, 1.0, 0.0]))
    acc = t._accumulate(acc, m2, sample_mask=jnp.asarray([1.0, 0.0, 0.0]))
    assert float(np.asarray(acc["_samples"])) == pytest.approx(3.0)
    results = t._epoch_results(acc)
    assert "_samples" not in results
    assert results["h"]["loss"] == pytest.approx(8 / 6)
    assert np.allclose(np.asarray(acc["h"]["confusion"]), np.eye(2) * 3)


def test_inflight_throttle_bounds_queue():
    from multimodalaggressionrecognition_tpu.train.loop import (
        _InflightThrottle)

    th = _InflightThrottle(3)
    for i in range(10):
        th.push({"x": jnp.float32(i), "_samples": jnp.float32(i)})
        assert len(th._q) <= 3
    th.push({})  # empty accumulator (pre-first-step) is a no-op
    assert len(th._q) <= 3
