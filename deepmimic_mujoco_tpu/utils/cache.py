"""Persistent-compilation-cache setup shared by every entry point.

The hosted TPU tunnel pays multi-minute cold XLA compiles for the big
training graphs, and the repo filesystem resets between build sessions, so
two things matter: (1) every long-lived process must WRITE the repo-local
cache so a relaunch (or a killed run's successor) is warm, and (2) the cache
is seeded from the committed warm copy (``benchdata/warm_jax_cache/``) so
the first launch of a session skips compiles captured in earlier sessions.

The reference has no analogue (TF-1 rebuilds its graph per process); this is
TPU-operations infrastructure the framework needs to be usable at all on a
remote-compile backend.
"""

from __future__ import annotations

import os
import shutil

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup_compilation_cache(repo_root: str | None = None) -> str:
    """Seed + enable the repo-local JAX compilation cache.

    Call after any ``jax.config.update("jax_platforms", ...)`` and before the
    first traced computation.  Returns the cache directory path.
    """
    import jax

    root = repo_root or _REPO_ROOT
    cache_dir = os.path.join(root, ".jax_cache")
    seed = os.path.join(root, "benchdata", "warm_jax_cache")
    if os.path.isdir(seed):
        os.makedirs(cache_dir, exist_ok=True)
        for f in os.listdir(seed):
            src = os.path.join(seed, f)
            dst = os.path.join(cache_dir, f)
            try:
                # re-seed entries that are missing OR torn (a process killed
                # mid-copy — e.g. a chain job hitting its timeout cap —
                # leaves a truncated file that would otherwise stay corrupt
                # for the whole session); size mismatch detects that
                if (os.path.exists(dst)
                        and os.path.getsize(dst) == os.path.getsize(src)):
                    continue
                # copy via a unique temp name + atomic os.replace so a kill
                # mid-copy never exposes a partial entry and concurrent
                # seeders (chain job overlapping the driver's bench)
                # converge to a whole file
                tmp = dst + f".seed.{os.getpid()}"
                shutil.copyfile(src, tmp)
                os.replace(tmp, dst)
            except OSError:
                pass  # seeding is best-effort; a miss just recompiles
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if jax.default_backend() == "cpu":
        # This jaxlib segfaults in executable.serialize() when writing large
        # sharded CPU executables (reproduced on the shard_map tests,
        # 2026-08-17).  Keep reads, never write on the CPU backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    return cache_dir
