#!/usr/bin/env python3
"""Learning-curve plot CLI (reference: /root/reference/src/plot_curve.py)."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log-dir", default="log_tmp")
    p.add_argument("--out", default=None)
    p.add_argument("--env-name", default="DeepMimic")
    args = p.parse_args(argv)

    from deepmimic_mujoco_tpu.utils.plotting import plot_curve

    out = plot_curve(args.log_dir, args.out, args.env_name)
    print("wrote", out)


if __name__ == "__main__":
    main()
