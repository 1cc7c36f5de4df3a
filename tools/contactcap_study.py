#!/usr/bin/env python3
"""Accuracy study for tightening the constraint top-k caps
(build_humanoid(contact_cap=..., limit_cap=...)).

The dual matrix A is (ne, ne) with ne = 3*contact_cap + limit_cap, and every
APGD pass re-streams A from HBM — the rollout's dominant bandwidth cost
(BASELINE.md r3 analysis).  Tightening the caps shrinks A *quadratically*
(ne=64 → 40 is 2.6× fewer bytes), compounding with the warm25+bf16 default.
This study measures what that costs in trajectory accuracy on the
P-controller mocap-tracking scenario (the contact-rich analogue of
/root/reference/src/env_torque_test.py:13-43), for a normal gait (walk) and
an acrobatic clip with harder landings (spinkick).

Baseline "truth" is the UNCAPPED solve under the production solver config;
cap16 (the current default) is included to show its own distance from full.
Speed lives in bench.py on the TPU (BENCH_CONTACT_CAP / BENCH_LIMIT_CAP).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from deepmimic_mujoco_tpu.envs import DPEnvV3  # noqa: E402
from deepmimic_mujoco_tpu.physics import build_humanoid  # noqa: E402


def rollout(env, n_steps=40, gain=0.8):
    """P-controller tracking (torque mode): ac = gain·(q_ref − q)."""
    s = env.reset_at(jax.random.PRNGKey(0), 0)
    step = jax.jit(env.step)
    qs = []
    for t in range(n_steps):
        ref = env.clip_qpos[(t + 1) % env.clip_len][7:]
        ac = gain * (ref - s.qpos[7:])
        s = step(s, ac)
        qs.append(np.asarray(s.qpos))
    return np.stack(qs)


def main():
    caps = {
        "full": (1 << 30, 1 << 30),
        "cap16": (16, 16),     # the r1/r2 default → ne = 64
        "cap12": (12, 12),     # ne = 48
        "cap10": (10, 10),     # ne = 40
        "cap8": (8, 8),        # ne = 32 → the r3 default
    }
    results = {}
    for clip in ("walk", "spinkick"):
        trajs = {}
        for name, (cc, lc) in caps.items():
            model = build_humanoid(contact_cap=cc, limit_cap=lc)
            env = DPEnvV3(clip=clip, model=model, n_substeps=1)
            trajs[name] = rollout(env)
            print(f"{clip}/{name}: done", flush=True)
        truth = trajs["full"]
        print(f"\n[{clip}] {'config':>6}  {'qpos RMS vs full (20 steps)':>28}"
              f"  {'(40 steps)':>12}")
        for name, q in trajs.items():
            if name == "full":
                continue
            d20 = float(np.sqrt(np.mean((q[:20] - truth[:20]) ** 2)))
            d40 = float(np.sqrt(np.mean((q - truth) ** 2)))
            results[(clip, name)] = (d20, d40)
            print(f"[{clip}] {name:>6}  {d20:>28.6f}  {d40:>12.6f}")
    return results


if __name__ == "__main__":
    main()
