#!/usr/bin/env python3
"""Import DeepMimic-format JSON motion clips into assets/motions/*.npz.

Usage:
    python tools/import_motions.py <src_dir_or_files...> [--out assets/motions]

The npz bundles store the *raw* frames untouched; all conversion happens in
``deepmimic_mujoco_tpu.mocap.loader`` at load time.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+", help="files or directories of DeepMimic JSON clips")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "assets", "motions"))
    args = ap.parse_args()

    files = []
    for src in args.sources:
        if os.path.isdir(src):
            files += sorted(glob.glob(os.path.join(src, "*.txt")))
            files += sorted(glob.glob(os.path.join(src, "*.json")))
        else:
            files.append(src)

    os.makedirs(args.out, exist_ok=True)
    for f in files:
        with open(f) as fin:
            data = json.load(fin)
        frames = np.asarray(data["Frames"], dtype=np.float64)
        loop = str(data.get("Loop", "wrap"))
        name = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.out, name + ".npz")
        np.savez(out, frames=frames, loop=loop, name=name)
        print(f"{name}: {frames.shape[0]} frames x {frames.shape[1]} -> {out}")


if __name__ == "__main__":
    main()
