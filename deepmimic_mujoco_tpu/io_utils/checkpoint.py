"""Checkpoint / resume.

Replaces the reference's TF-1 ``tf.train.Saver`` graph checkpoints
(/root/reference/src/trpo.py:220-224, utils/tf_util.py:314-361) with
msgpack-free numpy archives of explicit pytrees.  Unlike the reference,
optimizer state and normalizer statistics ARE checkpointed (SURVEY.md §5
notes the reference loses MpiAdam m/v/t on resume)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
    """Save a pytree to ``<path>.npz`` (flat key → array)."""
    leaves, treedef = jax.tree.flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save`; ``like`` provides the structure
    (and device placement is left to the caller).

    The stored ``__treedef__`` must match ``like``'s structure — a stale
    checkpoint with the same leaf count would otherwise silently mis-map
    leaves onto the wrong parameters."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
        saved_treedef = bytes(z["__treedef__"]).decode()
    treedef = jax.tree.structure(like)
    if len(leaves) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint {path!r} has {len(leaves)} leaves, expected "
            f"{treedef.num_leaves} — written by a different "
            "model/optimizer configuration")
    if saved_treedef != str(treedef):
        # structure drift: tolerate it only when every leaf shape still
        # lines up (e.g. a later-added leafless None field); a same-count
        # different-shape checkpoint would silently mis-map leaves
        like_leaves = jax.tree.leaves(like)
        bad = [
            (i, np.shape(s), np.shape(l))
            for i, (s, l) in enumerate(zip(leaves, like_leaves))
            if np.shape(s) != np.shape(l)
        ]
        if bad:
            i, ss, ls = bad[0]
            raise ValueError(
                f"checkpoint structure mismatch for {path!r} (leaf {i}: "
                f"saved shape {ss} vs expected {ls}):\n"
                f"  saved:    {saved_treedef[:200]}...\n"
                f"  expected: {str(treedef)[:200]}...\n"
                "The checkpoint was written by a different model/optimizer "
                "configuration.")
        import warnings

        warnings.warn(
            f"checkpoint {path!r} has a different pytree structure but "
            "identical leaf shapes; loading positionally (likely written "
            "by an older field layout)")
    return jax.tree.unflatten(treedef, leaves)
