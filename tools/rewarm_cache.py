#!/usr/bin/env python3
"""Refresh the committed warm compilation cache (benchdata/warm_jax_cache/)
from the session's live .jax_cache.

The warm cache exists because the repo filesystem resets between build
sessions while the hosted TPU tunnel pays multi-minute cold compiles; it is
a REFRESHABLE artifact, not history: entries embed jaxlib/XLA versions and
device kind in their keys, so on any toolchain bump (or default-config flip
that changes the programs) the old entries are dead weight.  This tool
therefore PRUNES by default (replaces the whole warm set with the current
session's entries) and records a manifest with the toolchain versions.

    python tools/rewarm_cache.py               # prune + copy all entries
    python tools/rewarm_cache.py --keep        # add to the existing set
    python tools/rewarm_cache.py --max-mb 64   # size guard
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--keep", action="store_true",
                   help="keep existing warm entries (default: prune)")
    p.add_argument("--max-mb", type=float, default=96.0,
                   help="abort if the resulting set would exceed this")
    args = p.parse_args()

    src = os.path.join(REPO, ".jax_cache")
    dst = os.path.join(REPO, "benchdata", "warm_jax_cache")
    if not os.path.isdir(src):
        sys.exit(f"no live cache at {src}")
    entries = [f for f in os.listdir(src) if not f.startswith(".")]
    if not entries:
        sys.exit("live cache is empty")

    total = sum(os.path.getsize(os.path.join(src, f)) for f in entries)
    if total / 1e6 > args.max_mb:
        sys.exit(f"live cache is {total / 1e6:.0f} MB > --max-mb "
                 f"{args.max_mb:.0f}; prune .jax_cache or raise the cap")

    if not args.keep and os.path.isdir(dst):
        for f in os.listdir(dst):
            if f != "MANIFEST.json":
                os.unlink(os.path.join(dst, f))
    os.makedirs(dst, exist_ok=True)
    for f in entries:
        tmp = os.path.join(dst, f + ".tmp")
        shutil.copyfile(os.path.join(src, f), tmp)
        os.replace(tmp, os.path.join(dst, f))

    import jax
    import jaxlib

    manifest = {
        "refreshed": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "note": ("refreshable artifact — regenerate with "
                 "tools/rewarm_cache.py after any toolchain bump or "
                 "default-config change; stale entries are dead weight"),
        "entries": len(entries),
        "total_mb": round(total / 1e6, 1),
    }
    with open(os.path.join(dst, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    main()
