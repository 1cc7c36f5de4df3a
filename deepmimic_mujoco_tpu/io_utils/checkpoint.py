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


def load(path: str, like: Any, allow_structure_drift: bool = False) -> Any:
    """Load a pytree saved by :func:`save`; ``like`` provides the structure
    (and device placement is left to the caller).

    The stored ``__treedef__`` must match ``like``'s structure — a stale
    checkpoint with the same leaf count would otherwise silently mis-map
    leaves onto the wrong parameters.  Structure drift is a hard error by
    default: two same-shaped leaves under reordered dict keys (e.g. actor
    and critic layers of equal width) would silently swap under positional
    loading.  Pass ``allow_structure_drift=True`` to opt in to positional
    loading of a checkpoint written by an older field layout whose leaf
    shapes all still line up."""
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
        like_leaves = jax.tree.leaves(like)
        bad = [
            (i, np.shape(s), np.shape(l))
            for i, (s, l) in enumerate(zip(leaves, like_leaves))
            if np.shape(s) != np.shape(l)
        ]
        if bad or not allow_structure_drift:
            detail = ""
            if bad:
                i, ss, ls = bad[0]
                detail = f" (leaf {i}: saved shape {ss} vs expected {ls})"
            raise ValueError(
                f"checkpoint structure mismatch for {path!r}{detail}:\n"
                f"  saved:    {saved_treedef[:200]}...\n"
                f"  expected: {str(treedef)[:200]}...\n"
                "The checkpoint was written by a different model/optimizer "
                "configuration."
                + ("" if bad else
                   " All leaf shapes line up; pass "
                   "allow_structure_drift=True to load positionally if the "
                   "drift is a benign field-layout change."))
        import warnings

        warnings.warn(
            f"checkpoint {path!r} has a different pytree structure but "
            "identical leaf shapes; loading positionally "
            "(allow_structure_drift=True)")
    return jax.tree.unflatten(treedef, leaves)
