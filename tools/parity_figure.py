#!/usr/bin/env python3
"""Learning-curve parity figure: the reference's bundled TRPO standup run
(/root/reference/src/log_tmp/DeepMimic/trpo-walk-0/progress.csv) overlaid
with this repo's run on the SAME x-axis semantics.

The reference's ``TimestepsSoFar`` counts only last-segment completed-episode
steps (trpo.py:310-311, ~3× undercount); our logs carry a
``RefCountedSteps`` column with identical semantics, so the curves are
directly comparable (see BASELINE.md).

    python tools/parity_figure.py [--repo-log train_logs/DPEnvV3/trpo-walk-0]
"""

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src/log_tmp/DeepMimic/trpo-walk-0/progress.csv"


def load(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--repo-log",
                   default=os.path.join(REPO, "train_logs/DPEnvV3/trpo-walk-0"))
    p.add_argument("--out",
                   default=os.path.join(REPO, "figures/parity-standup.svg"))
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not os.path.exists(REF):
        sys.exit("reference log not found (read-only reference missing?)")
    ref = load(REF)
    ours = load(os.path.join(args.repo_log, "progress.csv"))

    rx = [float(r["TimestepsSoFar"]) for r in ref]
    ry = [float(r["EpRewMean"]) for r in ref]
    ox = [float(r["RefCountedSteps"]) for r in ours]
    oy = [float(r["EpRewMean"]) for r in ours]

    fig, ax = plt.subplots(figsize=(7, 4.2))
    ax.plot(rx, ry, color="#888888", lw=1.0,
            label="reference (bundled trpo-walk-0, TF1/MuJoCo/MPI)")
    ax.plot(ox, oy, color="#b5543c", lw=1.2,
            label="deepmimic_mujoco_tpu (JAX/TPU)")
    ax.set_xlabel("episode-counted env steps (reference TimestepsSoFar "
                  "semantics)")
    ax.set_ylabel("EpRewMean (= EpLenMean, alive-bonus standup task)")
    ax.set_title("TRPO standup learning curve — reference vs this repo")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(alpha=0.25, lw=0.4)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out)
    print("wrote", args.out,
          f"(ref final {ry[-1]:.1f} / peak {max(ry):.1f}; "
          f"ours final {oy[-1]:.1f} / peak {max(oy):.1f})")


if __name__ == "__main__":
    main()
