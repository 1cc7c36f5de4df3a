#!/usr/bin/env python3
"""PD/P-controller mocap-tracking smoke test — the reference's
``env_torque_test.py`` (/root/reference/src/env_torque_test.py:13-43):
track the clip through the real dynamics with ``ac = 0.8·(q_ref − q)`` and
report the imitation rewards.  Validates actuators + reward plumbing."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--kp", type=float, default=0.8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnvV3

    env = DPEnvV3(clip=args.motion, reward_mode="mocap")

    @jax.jit
    def tracked_step(state):
        ref = env.clip_qpos[state.mocap_idx % env.clip_len]
        ac = args.kp * (ref[7:] - state.qpos[7:])
        return env.step(state, ac)

    state = env.reset_at(jax.random.PRNGKey(0), 0)
    total = 0.0
    for t in range(args.steps):
        state = tracked_step(state)
        total += float(state.reward)
        if (t + 1) % 20 == 0:
            print(f"step {t+1}: reward {float(state.reward):.4f} "
                  f"root z {float(state.qpos[2]):.3f} done {bool(state.done)}")
    print(f"mean tracking reward over {args.steps} steps: {total/args.steps:.4f}")


if __name__ == "__main__":
    main()
