"""Scan-unroll tuning knobs for the hot loops.

The r4 on-chip trace (benchdata/trace_r4_768_summary.json) attributes 42%
of device-busy time to while/scan loop overhead: the training step nests
horizon (64) x substeps (2) x RK4 stages (3) x APGD iterations (15/8) x
Newton-Schulz (10) loops whose bodies are tiny (B, 34, 34)-class ops, so
the fixed per-iteration loop cost (condition, carry shuffling, dispatch)
rivals the body work.  ``lax.scan(..., unroll=k)`` replicates the body k
times per trip — fewer loop iterations and larger straight-line blocks
XLA can fuse — at the price of a bigger program (slower compile).

Each site reads ``DMTPU_UNROLL_<SITE>`` (int; 0 = fully unroll, i.e.
unroll = trip count) with a measured default.  Sites:

  SOLVER    APGD iteration scan        (ops/apgd.py _apgd_scan)
  NS        Newton-Schulz M^-1 scans   (physics/engine.py mass_inverse)
  STAGES    RK4 stage scan             (physics/engine.py _rk4_substep*)
  SUBSTEPS  control-period substep scan (physics/engine.py _step_*_impl)
  HORIZON   TRPO rollout scan          (algos/trpo.py _rollout)

Defaults (v5e A/B, tools/unroll_study.sh → BASELINE.md round 5): fully
unroll every physics-side micro-loop; keep the horizon scan rolled (its
body is the entire env step — unrolling it only bloats compile time).
"""

from __future__ import annotations

import os

_DEFAULTS = {
    "solver": 0,    # full unroll (15/8-trip scans of one matvec each)
    "ns": 0,        # full unroll (8+2-trip scans of two matmuls each)
    "stages": 0,    # full unroll (3-trip scan)
    "substeps": 1,  # rolled: body = a whole RK4 substep (big already)
    "horizon": 1,   # rolled: body = the entire env step + policy
}


def unroll_for(site: str, length: int) -> int:
    """Unroll factor for a scan ``site`` with static trip count ``length``.
    Returns a value clamped to [1, length]; 0 (env or default) means fully
    unroll."""
    v = os.environ.get(f"DMTPU_UNROLL_{site.upper()}")
    k = int(v) if v not in (None, "") else _DEFAULTS.get(site, 1)
    if k <= 0 or k >= length:
        return max(1, length)
    return k
