"""Misc utilities (reference: /root/reference/src/utils/misc_util.py)."""

from __future__ import annotations

import random

import numpy as np


def zipsame(*seqs):
    """zip() that asserts equal lengths (misc_util.py:72-76)."""
    length = len(seqs[0])
    assert all(len(seq) == length for seq in seqs[1:])
    return zip(*seqs)


def set_global_seeds(seed: int) -> None:
    """Seed numpy/python RNGs (misc_util.py:131-142); JAX randomness is
    explicit-key so there is no global to seed — fold the seed into your
    PRNGKey instead."""
    np.random.seed(seed)
    random.seed(seed)


def boolean_flag(parser, name: str, default: bool = False, help: str = ""):
    """Add --name / --no-name flags (misc_util.py:223-235)."""
    dest = name.replace("-", "_")
    parser.add_argument(
        "--" + name, action="store_true", default=default, dest=dest, help=help)
    parser.add_argument("--no-" + name, action="store_false", dest=dest)


class EzPickle:
    """Constructor-args pickling mixin (misc_util.py:99-129)."""

    def __init__(self, *args, **kwargs):
        self._ezpickle_args = args
        self._ezpickle_kwargs = kwargs

    def __getstate__(self):
        return {"_ezpickle_args": self._ezpickle_args,
                "_ezpickle_kwargs": self._ezpickle_kwargs}

    def __setstate__(self, d):
        out = type(self)(*d["_ezpickle_args"], **d["_ezpickle_kwargs"])
        self.__dict__.update(out.__dict__)
