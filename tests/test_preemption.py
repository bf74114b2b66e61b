"""Preemption-safe training: SIGTERM -> mid-epoch checkpoint -> exact resume.

Beyond-reference capability (the reference could only restart at the last
completed epoch, reference trainer.py:67-68, 400-402).  Two layers:

1. deterministic in-process test: a fake guard stops the trainer after K
   steps of epoch 0; a fresh Trainer resumes from checkpoint_preempt and
   the final CSV logs match an uninterrupted run's numbers;
2. real-signal test (slow): a subprocess training run receives SIGTERM
   mid-epoch, exits 0 with a partial checkpoint, and a rerun completes
   with the uninterrupted run's losses.
"""

import csv
import os
import signal
import subprocess
import sys
import time

import numpy as np
import optax
import pytest

from multimodalaggressionrecognition_tpu.train.loop import Trainer
from multimodalaggressionrecognition_tpu.train.steps import (
    LossSpec, SingleHeadAdapter)


class _StopAfter:
    """Guard double: request preemption after `n` should_stop polls
    (train_epoch polls once per executed step)."""

    def __init__(self, n):
        self.n = n
        self.calls = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def should_stop(self):
        self.calls += 1
        return self.calls >= self.n


def _batches(n_batches=6, batch=8, feat=16):
    rng = np.random.default_rng(3)
    out = []
    for _ in range(n_batches):
        x = rng.standard_normal((batch, feat)).astype(np.float32)
        y = rng.integers(0, 2, size=(batch,)).astype(np.int32)
        out.append({
            "modalities": {"feat": {"data": x,
                                    "present": np.ones(batch, np.float32)}},
            "labels": {"main": y},
            "label_mask": {"main": np.ones(batch, np.float32)},
            "sample_mask": np.ones(batch, np.float32),
        })
    return out


def _make_trainer(run_dir, guard=None):
    import flax.linen as nn

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.relu(nn.Dense(32)(x))
            h = nn.Dropout(0.1, deterministic=not train)(h)
            return nn.Dense(2)(h)

    batches = _batches()
    trainer = Trainer(
        SingleHeadAdapter(Mlp(), modality="feat"),
        {"main": LossSpec("ce")}, optax.adam(3e-3),
        batches, batches, num_classes=2, saving_dir=run_dir,
        model_name="pre", run_dir=run_dir, log_console=False, seed=0,
        async_checkpoint=False)
    if guard is not None:
        trainer.preemption_guard = guard
    return trainer


def _losses(run_dir, split):
    with open(os.path.join(run_dir, f"main_{split}_log.csv")) as f:
        return [float(r["loss"]) for r in csv.DictReader(f)]


def test_preempt_resume_matches_uninterrupted(tmp_path):
    ref_dir = str(tmp_path / "ref")
    _make_trainer(ref_dir).fit(2)

    pre_dir = str(tmp_path / "pre")
    t1 = _make_trainer(pre_dir, guard=_StopAfter(3))
    t1.fit(2)
    # preempted mid-epoch-0: partial checkpoint, no completed-epoch logs
    assert os.path.isdir(os.path.join(pre_dir, "checkpoint_preempt"))
    assert not os.path.exists(os.path.join(pre_dir, "main_train_log.csv"))

    t2 = _make_trainer(pre_dir)
    meta = t2.resume_latest()
    assert meta["partial"] and meta["epoch"] == 0 and meta["batches_done"] == 3
    t2.fit(2)

    for split in ("train", "test"):
        np.testing.assert_allclose(_losses(pre_dir, split),
                                   _losses(ref_dir, split), rtol=2e-5)
    # the finished epoch cleared the partial checkpoint
    assert not os.path.exists(os.path.join(pre_dir, "checkpoint_preempt"))
    assert os.path.isdir(os.path.join(pre_dir, "checkpoint_current"))


def test_preempt_during_eval_saves_full_partial(tmp_path):
    """Signal during the test-set pass: the fully-trained epoch is saved
    as a partial with batches_done == all, and resume re-runs only
    eval/logging — final logs match the uninterrupted run."""
    ref_dir = str(tmp_path / "ref")
    _make_trainer(ref_dir).fit(2)

    run_dir = str(tmp_path / "run")
    # polls 1-6 are epoch 0's train steps; poll 7 is eval batch 0
    t = _make_trainer(run_dir, guard=_StopAfter(7))
    t.fit(2)
    assert os.path.isdir(os.path.join(run_dir, "checkpoint_preempt"))

    t2 = _make_trainer(run_dir)
    meta = t2.resume_latest()
    assert meta["partial"] and meta["batches_done"] == 6
    t2.fit(2)
    for split in ("train", "test"):
        np.testing.assert_allclose(_losses(run_dir, split),
                                   _losses(ref_dir, split), rtol=2e-5)


def test_preempt_between_epochs_stops_cleanly(tmp_path):
    run_dir = str(tmp_path / "run")
    # polls 1-6 train steps, 7-12 eval batches, 13 = fit's epoch-boundary
    # check: the epoch completes, saves normally, and fit breaks cleanly
    t = _make_trainer(run_dir, guard=_StopAfter(13))
    t.fit(3)
    assert not os.path.exists(os.path.join(run_dir, "checkpoint_preempt"))
    assert len(_losses(run_dir, "train")) == 1  # only epoch 0 ran

    t2 = _make_trainer(run_dir)
    t2.resume_latest()
    assert t2.start_epoch == 1 and t2._partial is None


def test_resume_keeps_prior_epoch_log_rows(tmp_path):
    """Preemption in epoch 1 after epoch 0 completed: the resumed process
    must append to the CSV history, not overwrite it with its own epochs."""
    ref_dir = str(tmp_path / "ref")
    _make_trainer(ref_dir).fit(2)

    run_dir = str(tmp_path / "run")
    # epoch 0 costs 13 polls (6 train + 6 eval + boundary); polls 14-16
    # are epoch 1's first train steps -> preempted at epoch 1, batch 3
    t = _make_trainer(run_dir, guard=_StopAfter(16))
    t.fit(2)
    assert len(_losses(run_dir, "train")) == 1  # epoch 0 logged

    t2 = _make_trainer(run_dir)
    meta = t2.resume_latest()
    assert meta["partial"] and meta["epoch"] == 1 and meta["batches_done"] == 3
    t2.fit(2)
    for split in ("train", "test"):
        got = _losses(run_dir, split)
        assert len(got) == 2, f"epoch-0 row lost from {split} log"
        np.testing.assert_allclose(got, _losses(ref_dir, split), rtol=2e-5)


_CHILD = r"""
import os, sys
sys.path.insert(0, "@REPO@")

from multimodalaggressionrecognition_tpu.utils.compile_cache import (
    enable_test_cache)
enable_test_cache()

from tests.test_preemption import _make_trainer


class _Slow:
    def __init__(self, batches, delay):
        self.batches = batches
        self.delay = delay

    def __iter__(self):
        import time
        for i, b in enumerate(self.batches):
            time.sleep(self.delay)
            print(f"batch {i}", flush=True)
            yield b

    def __len__(self):
        return len(self.batches)


t = _make_trainer(sys.argv[1])
delay = float(sys.argv[2])
t.train_loader = _Slow(t.train_loader, delay)
print("child ready", flush=True)
t.resume_latest()
t.fit(2)
print("child done", flush=True)
"""


@pytest.mark.slow
def test_sigterm_checkpoint_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    run_dir = str(tmp_path / "run")
    child = subprocess.Popen(
        [sys.executable, "-u", "-c", _CHILD.replace("@REPO@", repo),
         run_dir, "0.4"],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    # wait until epoch 0 is mid-flight (batch 1 of 6 done), then TERM:
    # the remaining slow batches guarantee the signal lands inside the
    # train loop, not in eval or between epochs
    deadline = time.time() + 180
    seen_batch1 = False
    while time.time() < deadline:
        line = child.stdout.readline()
        if "batch 1" in line:
            seen_batch1 = True
            break
    assert seen_batch1, "child never reached batch 1"
    child.send_signal(signal.SIGTERM)
    out, _ = child.communicate(timeout=120)
    assert child.returncode == 0, out[-2000:]
    assert "[preemption] caught signal" in out, out[-2000:]
    # mid-epoch stop: partial checkpoint exists, no completed-epoch log
    assert os.path.isdir(os.path.join(run_dir, "checkpoint_preempt"))
    assert not os.path.exists(os.path.join(run_dir, "main_train_log.csv"))

    # resume without signals: completes both epochs
    resume = subprocess.run(
        [sys.executable, "-u", "-c", _CHILD.replace("@REPO@", repo),
         run_dir, "0.0"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=300)
    assert resume.returncode == 0, resume.stdout[-2000:]
    assert "child done" in resume.stdout
    losses = _losses(run_dir, "train")
    assert len(losses) == 2
