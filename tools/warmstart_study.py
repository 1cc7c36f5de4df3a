#!/usr/bin/env python3
"""Accuracy study for warm-started constraint solves (PhysicsModel.
warm_iterations): compares trajectories of the P-controller mocap-tracking
scenario (the contact-rich analogue of the reference's env_torque_test.py,
/root/reference/src/env_torque_test.py:13-43) under

  * cold-50  (legacy default: every solve cold at model.iterations=50)
  * warm-K   (every solve warm-started from the previous stage/substep's
              forces at K iterations; first solve of each control step cold)
  * cold-300 ("truth": near-converged dual)

Metric: per-step qpos RMS divergence from cold-300 over N contact-rich
control steps, plus the first-20-step mean weighted pose error used by the
r2 PGS parity study (BASELINE.md).  Run on CPU; the speed measurement lives
in bench.py on the TPU.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
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
    results = {}
    # the study sweeps FROM the exact-cold configuration (build_humanoid
    # now defaults to warm25+bf16 — the config this study motivated)
    base = build_humanoid(warm_iterations=0, solver_dtype="f32")
    configs = {
        "cold300": dataclasses.replace(base, iterations=300),
        "cold50": base,
        "warm25": dataclasses.replace(base, warm_iterations=25),
        "warm15": dataclasses.replace(base, warm_iterations=15),
        "warm10": dataclasses.replace(base, warm_iterations=10),
        "bf16": dataclasses.replace(base, solver_dtype="bf16"),
        "warm25+bf16": dataclasses.replace(base, warm_iterations=25,
                                           solver_dtype="bf16"),
        # stage-frozen kinematics (PhysicsModel.stage_reuse='kin'):
        # FK/M⁻¹/contacts/A computed once per substep, stages 2-4 reuse
        # them and warm-solve the SAME dual at stage_iterations budget
        "stage_kin": dataclasses.replace(
            base, warm_iterations=25, solver_dtype="bf16",
            stage_reuse="kin"),
        "stage_kin8": dataclasses.replace(
            base, warm_iterations=25, solver_dtype="bf16",
            stage_reuse="kin", stage_iterations=8),
        "stage_kin12": dataclasses.replace(
            base, warm_iterations=25, solver_dtype="bf16",
            stage_reuse="kin", stage_iterations=12),
        # production candidate: frozen stages + shorter stage-1 budget
        "stage_kin12w15": dataclasses.replace(
            base, warm_iterations=15, solver_dtype="bf16",
            stage_reuse="kin", stage_iterations=12),
    }
    trajs = {}
    for name, model in configs.items():
        env = DPEnvV3(clip="walk", model=model, n_substeps=1)
        trajs[name] = rollout(env)
        print(f"{name}: done")

    truth = trajs["cold300"]
    print(f"\n{'config':>10}  {'qpos RMS vs cold300 (20 steps)':>32}  "
          f"{'(40 steps)':>12}")
    for name, q in trajs.items():
        if name == "cold300":
            continue
        d20 = float(np.sqrt(np.mean((q[:20] - truth[:20]) ** 2)))
        d40 = float(np.sqrt(np.mean((q - truth) ** 2)))
        results[name] = (d20, d40)
        print(f"{name:>10}  {d20:>32.6f}  {d40:>12.6f}")
    return results


if __name__ == "__main__":
    main()
