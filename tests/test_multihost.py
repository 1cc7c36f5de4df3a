"""Multi-process (multi-host) smoke tests: 2 local processes coordinate via
``jax.distributed`` — the ``mpirun -np 2`` analogue
(/root/reference/src/train_mpi.sh:1, utils/mpi_util.py:62+).

Exercises the branches single-process tests cannot reach:
``initialize_distributed`` with an explicit coordinator, and the
multi-process paths of ``share_bytes``/``share_file``."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)

_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import os

pid = int(sys.argv[1])
port = sys.argv[2]
tmp = sys.argv[3]

from deepmimic_mujoco_tpu.parallel.collectives import share_bytes, share_file
from deepmimic_mujoco_tpu.parallel.mesh import initialize_distributed

rank = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert rank == pid, (rank, pid)
assert jax.process_count() == 2

# share_bytes: process 0's blob reaches process 1
blob = b"ckpt\x00\x01payload" if pid == 0 else None
got = share_bytes(blob)
assert got == b"ckpt\x00\x01payload", got

# share_file: written by 0, replicated to 1's filesystem path
path = os.path.join(tmp, "shared", "model.bin")
if pid == 0:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"weights")
share_file(path)
with open(path, "rb") as f:
    assert f.read() == b"weights"

# a cross-process collective over the global mesh
import jax.numpy as jnp
from jax.experimental import multihost_utils

total = multihost_utils.process_allgather(jnp.asarray([pid + 1.0]))
assert float(total.sum()) == 3.0, total
print(f"proc {pid} OK")
"""


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # both workers need distinct per-process dirs but a SHARED tmp for the
    # share_file check (they run on one machine, as localhost "hosts")
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
    # share_file must have replicated the file to the shared path
    assert (tmp_path / "shared" / "model.bin").read_bytes() == b"weights"
