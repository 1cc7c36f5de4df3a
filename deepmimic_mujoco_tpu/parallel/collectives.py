"""Collective helpers over the device mesh.

The reference's MPI vocabulary maps 1:1 (SURVEY.md §5 "Distributed
communication backend"):

  MPI.Allreduce(SUM)/nworkers  →  lax.pmean           (gradient averaging)
  MPI.Bcast(root=0)            →  replicated params under SPMD (no-op)
  MPI.allgather                →  lax.all_gather      (stats, sync checks)

All helpers are no-ops when ``axis_name`` is None so the same learner code
runs single-device and multi-device."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def maybe_pmean(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def maybe_psum(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def share_bytes(data: Optional[bytes]) -> bytes:
    """Broadcast process 0's byte blob to every host — the reference's
    ``share_file`` (utils/mpi_util.py:62+, used to ship checkpoints to
    workers without a shared filesystem).  Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        assert data is not None
        return data
    import numpy as np
    from jax.experimental import multihost_utils

    length = np.zeros((), np.int64) if data is None else np.asarray(
        len(data), np.int64)
    length = int(multihost_utils.broadcast_one_to_all(length))
    buf = np.zeros(length, np.uint8)
    if data is not None and jax.process_index() == 0:
        buf[:] = np.frombuffer(data, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(buf))


def share_file(path: str) -> None:
    """Replicate a file from process 0 to all hosts (reference
    ``share_file`` semantics): reads on 0, writes everywhere else."""
    import os

    import jax

    data = None
    if jax.process_index() == 0:
        with open(path, "rb") as f:
            data = f.read()
    data = share_bytes(data)
    if jax.process_index() != 0:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)


def sync_check(flat_params: jnp.ndarray, flat_opt: jnp.ndarray,
               axis_name: Optional[str]):
    """Replica-divergence tripwire — the reference asserts all ranks hold
    identical (policy-sum, vf-adam-sum) every 20 iters (trpo.py:285-287) and
    inside MpiAdam.check_synced (mpi_adam.py:42-50).

    Returns a bool array: True iff this replica's sums match replica 0's."""
    sums = jnp.stack([jnp.sum(flat_params), jnp.sum(flat_opt)])
    if axis_name is None:
        return jnp.asarray(True)
    all_sums = jax.lax.all_gather(sums, axis_name)
    return jnp.all(jnp.abs(all_sums - all_sums[0]) <= 1e-4 * (1.0 + jnp.abs(all_sums[0])))
