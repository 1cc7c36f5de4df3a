#!/usr/bin/env python3
"""Find the binding constraint behind the per-clip PD tracking ceiling
(tools/clip_tracking_study.py): decompose the one-step imitation_dm reward
into its five exp-terms and A/B the control knobs — control rate
(n_substeps), PD gains, torque limits.

    python tools/tracking_ceiling_probe.py --clip spinkick
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clip", default="spinkick")
    p.add_argument("--platform", default="cpu")
    p.add_argument("--n-frames", type=int, default=32)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.envs import rewards
    from deepmimic_mujoco_tpu.envs.dp_env_v3 import DPEnvV3
    from deepmimic_mujoco_tpu.physics import kinematics

    def probe(name, n_substeps=2, gain_mul=1.0, torque_mul=1.0, interp=False,
              vels="consistent"):
        env = DPEnvV3(clip=args.clip, reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=n_substeps,
                      pd_target_interp=interp, clip_velocities=vels)
        if gain_mul != 1.0:
            env._kp = env._kp * gain_mul
            env._kd = env._kd * gain_mul
        if torque_mul != 1.0:
            env.model = dataclasses.replace(
                env.model,
                actuator_gear=env.model.actuator_gear * torque_mul)
        zero = jnp.zeros(env.action_size, jnp.float32)
        starts = jnp.asarray(
            np.linspace(0, env.clip_len - 2, args.n_frames).round(),
            jnp.int32)

        def track1(idx, key):
            s = env.reset_at(key, idx)
            s1 = env.step(s, zero)
            # recompute the reward with term decomposition
            ridx, cycles = env._clip_index(s1.mocap_idx, s1.init_idx)
            offset = cycles * env.cycle_offset
            ref_qp = env.clip_qpos[ridx].at[0:3].add(offset)
            ref_qv = env.clip_qvel[ridx]
            kin = kinematics.fk(env.model, s1.qpos)
            ee = kinematics.geom_world_pos(env.model, kin)[env._ee_geoms]
            com_vel = kinematics.com_velocity(env.model, kin, s1.qvel)
            r, terms = rewards.deepmimic_reward(
                s1.qpos, s1.qvel, ref_qp, ref_qv,
                ee_pos=ee, ref_ee_pos=env.clip_ee[ridx] + offset,
                com_vel=com_vel, ref_com_vel=env.clip_com_vel[ridx],
                return_terms=True)
            return r, terms

        r, terms = jax.jit(jax.vmap(track1))(
            starts, jax.random.split(jax.random.PRNGKey(0), args.n_frames))
        r = np.asarray(r)
        tm = {k: float(np.mean(np.asarray(v))) for k, v in terms.items()}
        worst = int(np.argmin(r))
        tw = {k: float(np.asarray(v)[worst]) for k, v in terms.items()}
        print(f"{name:24s} r={r.mean():.3f} min={r.min():.3f}"
              f"  terms(mean) pose={tm['pose']:.2f} vel={tm['vel']:.2f}"
              f" ee={tm['ee']:.2f} root={tm['root']:.2f} com={tm['com']:.2f}"
              f"  worst@f{int(np.asarray(starts)[worst])}"
              f" pose={tw['pose']:.2f} vel={tw['vel']:.2f} ee={tw['ee']:.2f}"
              f" root={tw['root']:.2f} com={tw['com']:.2f}", flush=True)

    probe("ref vels, held tgt", vels="reference")
    probe("fd vels, held tgt")
    probe("fd vels, stepped tgt", interp=True)
    probe("fd vels, 60Hz ctrl", n_substeps=1)
    probe("ref vels, 60Hz ctrl", n_substeps=1, vels="reference")


if __name__ == "__main__":
    main()
