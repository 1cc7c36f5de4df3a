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
