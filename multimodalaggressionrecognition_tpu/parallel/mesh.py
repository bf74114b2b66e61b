"""Device mesh + sharding rules for data-parallel training.

The reference had no distributed layer at all (single cuda:0 everywhere,
SURVEY.md §2.6); this module is the new first-class replacement: a 1-D
`data` mesh over the chips of a slice (v5e-8 target), batches sharded on
their leading axis, parameters/optimizer state replicated.  Gradient and
metric reductions are XLA collectives over ICI inserted automatically by
jit when sharded batches meet replicated params — no hand-written
all-reduce is needed at these model scales.

A `model` axis is reserved in `make_mesh` for future tensor parallelism
(documented out of scope for these model sizes, SURVEY.md §2.6).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host initialization (DCN axis scale-out).

    Call once per host before any device use; afterwards `jax.devices()`
    spans the full slice and `make_mesh` shards across hosts (XLA routes
    in-host collectives over ICI and cross-host over DCN).  No-op on a
    single process.  The reference had no distributed layer at all
    (SURVEY.md §5.8).
    """
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(devices: Optional[Sequence] = None, data_axis: str = "data",
              model_axis: Optional[str] = None, model_parallelism: int = 1):
    devices = list(devices if devices is not None else jax.devices())
    if model_axis is None or model_parallelism == 1:
        return Mesh(np.array(devices), (data_axis,))
    n = len(devices)
    grid = np.array(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (data_axis, model_axis))


def data_sharding(mesh: Mesh, data_axis: str = "data"):
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place every array leaf of a batch pytree with its leading axis sharded."""
    sh = data_sharding(mesh, data_axis)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
