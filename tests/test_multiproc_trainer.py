"""Two-process PRODUCTION training path (VERDICT r2 item 4).

A 2-process CPU run (2 virtual devices each -> 4-device global mesh) drives
the real `Trainer.fit` for two epochs with per-host data:
`ProcessLocalBatches` slices each deterministic global batch,
`device_prefetch` reassembles global arrays via
`jax.make_array_from_process_local_data`, the jitted step runs over the
global mesh (jit inserts the DCN collectives), and process 0 writes the
CSV logs while the orbax checkpoint save is collective.

The parent then runs the IDENTICAL training single-process and requires the
per-epoch train/test losses to match to 1e-5 — multi-process DP must be a
pure layout change, not a numerics change.
"""

import csv
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
coord = sys.argv[3]
run_dir = sys.argv[4]

from multimodalaggressionrecognition_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, data_sharding)

initialize_distributed(coordinator_address=coord, num_processes=nprocs,
                       process_id=proc_id)

import jax

from multimodalaggressionrecognition_tpu.utils.compile_cache import (
    enable_test_cache)
enable_test_cache()

from multimodalaggressionrecognition_tpu.data.pipeline import (
    ProcessLocalBatches)
from tests.test_multiproc_trainer import build_batches, run_training

mode = sys.argv[5] if len(sys.argv) > 5 else ""
guard = None
if mode == "preempt":
    # preemption signal on ONE process only: the consensus in
    # PreemptionGuard.should_stop must stop BOTH at the same step or the
    # collective preempt save deadlocks
    from multimodalaggressionrecognition_tpu.utils.preemption import (
        PreemptionGuard)

    class CountingGuard(PreemptionGuard):
        polls = 0

        def should_stop(self):
            CountingGuard.polls += 1
            if proc_id == 1 and CountingGuard.polls == 3:
                self.request()
            return super().should_stop()

    # interval=1: consensus on every poll so the stopping step is the
    # poll the flag was raised at (production default amortizes the
    # blocking allgather over consensus_interval polls)
    guard = CountingGuard(consensus_interval=1)

mesh = make_mesh(jax.devices(), data_axis="data")
batches = build_batches()
run_training(ProcessLocalBatches(batches), run_dir,
             sharding=data_sharding(mesh), guard=guard,
             resume=(mode == "resume"))
print(f"proc {proc_id}: trainer ok")
"""


def build_batches(n_batches=4, batch=8, feat=16):
    """Deterministic synthetic single-head batches (global view)."""
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_batches):
        x = rng.standard_normal((batch, feat)).astype(np.float32)
        y = rng.integers(0, 2, size=(batch,)).astype(np.int32)
        batches.append({
            "modalities": {"feat": {"data": x,
                                    "present": np.ones(batch, np.float32)}},
            "labels": {"main": y},
            "label_mask": {"main": np.ones(batch, np.float32)},
            "sample_mask": np.ones(batch, np.float32),
        })
    return batches


def run_training(loader, run_dir, sharding=None, guard=None, resume=False):
    import flax.linen as nn
    import optax

    from multimodalaggressionrecognition_tpu.train.loop import Trainer
    from multimodalaggressionrecognition_tpu.train.steps import (
        LossSpec, SingleHeadAdapter)

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.relu(nn.Dense(32)(x))
            return nn.Dense(2)(h)

    model = SingleHeadAdapter(Mlp(), modality="feat")
    trainer = Trainer(
        model, {"main": LossSpec("ce")}, optax.sgd(0.05),
        loader, loader, num_classes=2, saving_dir=run_dir,
        model_name="mp", run_dir=run_dir, log_console=False,
        sharding=sharding, seed=0)
    if guard is not None:
        trainer.preemption_guard = guard
    if resume:
        trainer.resume_latest()
    trainer.fit(2)
    return trainer


def _read_losses(run_dir, split):
    path = os.path.join(run_dir, f"main_{split}_log.csv")
    with open(path) as f:
        return [float(r["loss"]) for r in csv.DictReader(f)]


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    finally:
        s.close()


@pytest.mark.slow
def test_two_process_trainer_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    mp_dir = str(tmp_path / "mp_run")
    os.makedirs(mp_dir, exist_ok=True)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(i), "2", coord, mp_dir],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-process trainer timed out; output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "trainer ok" in out

    # single-process reference with the identical global batches
    sp_dir = str(tmp_path / "sp_run")
    run_training(build_batches(), sp_dir, sharding=None)

    for split in ("train", "test"):
        mp_losses = _read_losses(mp_dir, split)
        sp_losses = _read_losses(sp_dir, split)
        assert len(mp_losses) == len(sp_losses) == 2
        np.testing.assert_allclose(mp_losses, sp_losses, atol=1e-5)

    # the collective checkpoint must exist and be restorable single-process
    assert os.path.isdir(os.path.join(mp_dir, "checkpoint_current", "state"))
    assert os.path.isfile(os.path.join(mp_dir, "checkpoint_current",
                                       "meta.json"))


@pytest.mark.slow
def test_two_process_preemption_consensus(tmp_path):
    """Preemption signalled on ONE process: the cross-process consensus in
    PreemptionGuard.should_stop must stop both at the same step (else the
    collective preempt save deadlocks), and a 2-process resume must
    reproduce the uninterrupted single-process run."""
    import json

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mp_dir = str(tmp_path / "mp_run")
    os.makedirs(mp_dir, exist_ok=True)

    def launch(mode):
        coord = f"127.0.0.1:{_free_port()}"
        procs = [subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), "2", coord, mp_dir, mode],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} ({mode}):\n{out[-4000:]}"

    launch("preempt")
    meta = json.load(open(os.path.join(mp_dir, "checkpoint_preempt",
                                       "meta.json")))
    assert meta["partial"] and meta["epoch"] == 0
    assert meta["batches_done"] == 3  # proc 1 requested at poll 3

    launch("resume")
    assert not os.path.exists(os.path.join(mp_dir, "checkpoint_preempt"))

    sp_dir = str(tmp_path / "sp_run")
    run_training(build_batches(), sp_dir, sharding=None)
    for split in ("train", "test"):
        np.testing.assert_allclose(_read_losses(mp_dir, split),
                                   _read_losses(sp_dir, split), atol=1e-5)
