"""Device-mesh construction and batch sharding.

Replaces ``mpirun -np 8`` + per-rank env/replica
(/root/reference/src/train_mpi.sh:1, utils/mpi_util.py:26-60) with a JAX
mesh: envs are sharded over the ``env`` axis, parameters replicated, and the
learner's collectives ride ICI via ``pmean``/``psum`` compiled into the
training step."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = ENV_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = ENV_AXIS):
    """Place a pytree with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host SPMD bring-up — the ``mpirun -np 8`` replacement
    (train_mpi.sh:1).  On TPU pods the three arguments are discovered from
    the environment automatically; on CPU/GPU clusters pass them (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Safe to call single-process (no coordinator configured → no-op).
    Returns this process's index."""
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    on_tpu_pod = "TPU_WORKER_HOSTNAMES" in os.environ
    if addr is None and not on_tpu_pod:
        return 0  # single process
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return jax.process_index()
