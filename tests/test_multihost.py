"""Two-process jax.distributed smoke test for initialize_distributed.

Exercises the DCN multi-host init hook (parallel/mesh.py, SURVEY.md §5.8):
two OS processes each with 2 virtual CPU devices form a 4-device global
mesh, run initialize_distributed + a psum-reduced jitted computation over
the global mesh, and must agree on the all-reduced value. Runs fully on
CPU; skipped gracefully if the local TCP coordinator cannot bind.
"""

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

from multimodalaggressionrecognition_tpu.parallel.mesh import (
    initialize_distributed, make_mesh)

initialize_distributed(coordinator_address=coord, num_processes=nprocs,
                       process_id=proc_id)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalaggressionrecognition_tpu.utils.compile_cache import (
    enable_test_cache)
enable_test_cache()

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == nprocs * 2, jax.devices()

mesh = make_mesh(jax.devices(), data_axis="data")
sharding = NamedSharding(mesh, P("data"))

# one distinct shard per global device: value == device index
local = np.arange(2, dtype=np.float32) + 2 * proc_id
garr = jax.make_array_from_single_device_arrays(
    (nprocs * 2,), sharding,
    [jax.device_put(local[i:i + 1], d)
     for i, d in enumerate(jax.local_devices())])

@jax.jit
def total(x):
    return jnp.sum(x)  # jit inserts the cross-process all-reduce

got = float(total(garr))
expect = float(np.arange(nprocs * 2).sum())
assert got == expect, (got, expect)
print(f"proc {proc_id}: psum ok ({got})")
"""


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    finally:
        s.close()


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
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

    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(i), "2", coord],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed smoke timed out; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "psum ok (6.0)" in out, out[-1000:]
