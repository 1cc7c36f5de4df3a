"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4: XLA host-device virtualization replaces a real pod)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosted-TPU harness ignores JAX_PLATFORMS; force CPU via config so the
# virtual 8-device mesh is actually used (and tests don't round-trip to a
# remote chip per op).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: physics-step programs take ~1 min to compile
# on CPU; cache them across test processes/sessions.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
# READ-mostly: this jaxlib segfaults in executable.serialize() when writing
# large sharded CPU executables to the persistent cache (reproduced twice on
# tests/test_parallel.py shard_map programs, 2026-08-17, fresh cache dir —
# crash stack: compilation_cache.put_executable_and_time).  Old entries still
# serve reads; the effectively-infinite min compile time disables writes.
# DMTPU_TEST_CACHE=w opts into writes for CONTROLLED warm-up runs (one small
# module per fresh process keeps RSS far below the crash regime) — used to
# populate benchdata/warm_test_cache/, the committed seed below that makes
# the `-m fast` tier run warm (jit compiles on this 1-core host are 25-75 s
# each; the fast tier would otherwise blow its <5 min budget on compiles).
if os.environ.get("DMTPU_TEST_CACHE") == "w":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

# Seed the session cache from the committed warm copy (best-effort).
_SEED_DIR = os.path.join(os.path.dirname(__file__), "..", "benchdata",
                         "warm_test_cache")
if os.path.isdir(_SEED_DIR):
    import shutil

    os.makedirs(os.path.abspath(_CACHE_DIR), exist_ok=True)
    for _f in os.listdir(_SEED_DIR):
        _dst = os.path.join(os.path.abspath(_CACHE_DIR), _f)
        if not os.path.exists(_dst):
            try:
                _tmp = _dst + f".seed.{os.getpid()}"
                shutil.copyfile(os.path.join(_SEED_DIR, _f), _tmp)
                os.replace(_tmp, _dst)
            except OSError:
                pass

import pytest  # noqa: E402

# Compiled executables accumulate in-process (~50 MB/test average; the full
# suite climbs past 10 GB RSS) and this host's XLA CPU backend segfaults —
# in compile or executable (de)serialization, not a Python MemoryError —
# once the process is that large (three distinct late-suite crashes,
# 2026-08-18).  Dropping JAX's in-memory caches every N tests keeps RSS
# bounded; cross-test jit reuse within a module survives between flushes.
_CLEAR_EVERY = 40
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_jax_cache():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "src"))


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="upstream reference checkout not present"
)
