#!/usr/bin/env python3
"""Mocap playback smoke test — the reference's ``play_mocap.py`` /
``dp_env_v3.py __main__`` (/root/reference/src/dp_env_v3.py:173-202): step
through a clip's frames, write them into the state, report the config reward,
optionally export a video.

Headless by design (no interactive viewer on TPU hosts): prints per-cycle
reward stats and can dump an ``.avi`` via host MuJoCo rendering."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="spinkick")
    p.add_argument("--cycles", type=int, default=2)
    p.add_argument("--video", default=None, help="output .avi path")
    p.add_argument("--through-dynamics", action="store_true",
                   help="also step the physics after each frame write "
                        "(dp_env_v3 __main__ behaviour)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.mocap.registry import get_clip

    clip = get_clip(args.motion)
    env = DPEnvV3(clip=clip, reward_mode="mocap")
    print(f"{clip.name}: {len(clip)} frames, dt={clip.dt:.4f}, loop={clip.loop}")

    qpos_track = []
    # kinematic playback with root phase-offset chaining (mocap_v2.play,
    # /root/reference/src/mujoco/mocap_v2.py:151-182)
    phase_offset = np.zeros(3)
    rewards = []
    step = jax.jit(env.step) if args.through_dynamics else None
    state = env.reset_at(jax.random.PRNGKey(0), 0)
    for cycle in range(args.cycles):
        for k in range(len(clip)):
            qpos = np.asarray(clip.qpos[k], np.float64).copy()
            qpos[:3] += phase_offset
            qpos_track.append(qpos.copy())
            if args.through_dynamics:
                state = env.reset_at(jax.random.PRNGKey(0), k)
                state = step(state, jnp.zeros(28))
                rewards.append(float(state.reward))
        phase_offset = qpos_track[-1][:3].copy()
        phase_offset[2] = 0.0
        if rewards:
            print(f"cycle {cycle}: mean config reward "
                  f"{np.mean(rewards[-len(clip):]):.4f}")

    if args.video:
        from deepmimic_mujoco_tpu.io_utils.video import render_qpos_trajectory

        out = render_qpos_trajectory(
            np.stack(qpos_track), args.video, fps=int(round(1.0 / clip.dt)))
        print("wrote", out)


if __name__ == "__main__":
    main()
