#!/usr/bin/env python3
"""Per-clip PD-tracking diagnostics — is the imitation plateau an RL
problem or a physics/control ceiling?

For every bundled clip, with the training configuration (imitation_dm
reward, pd_residual control, n_substeps=2):

* **one-step tracking**: reset the env to a mocap frame, apply a ZERO
  residual (pure stable-PD toward the next reference frame) for one
  control step, and record the reward.  This is the per-step reward an
  ideal policy gets when perfectly synchronized — compounding drift
  excluded.  If this is far below 1 for a clip, no policy (which can only
  modulate PD targets) can score well on it: the ceiling is the PD
  gains / physics timestep, not learning.
* **open-loop rollout**: reset at frame 0 (and a few RSI starts), feed
  zero residuals for up to ``--horizon`` steps, record reward/step and
  episode length under the fall-contact rule.  Shows how fast drift
  accumulates without feedback.

    python tools/clip_tracking_study.py --out benchdata/clip_tracking.json

Runs on CPU by default (pin with --platform tpu to use the chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="cpu")
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--n-frames", type=int, default=32,
                   help="one-step tracking sample frames per clip")
    p.add_argument("--n-starts", type=int, default=8,
                   help="RSI starts for the open-loop rollout")
    p.add_argument("--clips", default="")
    p.add_argument("--joint-limits", default="xml", choices=["xml", "mocap"],
                   help="mocap = widen hinge ranges to cover the clip poses "
                        "(physics/humanoid.py mocap_hinge_range)")
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.envs.dp_env_v3 import DPEnvV3
    from deepmimic_mujoco_tpu.mocap.registry import available_clips

    clips = (args.clips.split(",") if args.clips else available_clips())

    model = None
    if args.joint_limits == "mocap":
        from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range

        model = mocap_hinge_range(None)

    rows = []
    for name in clips:
        env = DPEnvV3(clip=name, model=model, reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2,
                      max_episode_steps=args.horizon)
        zero = jnp.zeros(env.action_size, jnp.float32)
        key = jax.random.PRNGKey(0)

        # --- one-step tracking from n_frames uniform starts ---
        starts = jnp.asarray(
            np.linspace(0, env.clip_len - 2, args.n_frames).round(),
            jnp.int32)

        def track1(idx, key):
            s = env.reset_at(key, idx)
            s = env.step(s, zero)
            return s.reward, s.done

        r1, d1 = jax.jit(jax.vmap(track1))(
            starts, jax.random.split(key, args.n_frames))

        # --- open-loop rollout from n_starts RSI starts ---
        s_idx = jnp.asarray(
            np.linspace(0, env.clip_len - 2, args.n_starts).round(),
            jnp.int32)

        def rollout(idx, key):
            s0 = env.reset_at(key, idx)

            def body(carry, _):
                s, alive, rew, length = carry
                s1 = env.step(s, zero)
                alive1 = alive & ~s1.done
                rew = rew + jnp.where(alive, s1.reward, 0.0)
                length = length + alive.astype(jnp.int32)
                return (s1, alive1, rew, length), None

            (_, _, rew, length), _ = jax.lax.scan(
                body, (s0, jnp.ones((), bool), jnp.zeros(()),
                       jnp.zeros((), jnp.int32)),
                None, length=args.horizon)
            return rew, length

        rew, length = jax.jit(jax.vmap(rollout))(
            s_idx, jax.random.split(key, args.n_starts))
        rew, length = np.asarray(rew), np.asarray(length)
        row = {
            "clip": name,
            "clip_len": env.clip_len,
            "clip_fps": round(1.0 / env.clip.dt, 1),
            "loop": env.clip.loop,
            "onestep_reward_mean": float(np.mean(np.asarray(r1))),
            "onestep_reward_min": float(np.min(np.asarray(r1))),
            "onestep_done_frac": float(np.mean(np.asarray(d1))),
            "openloop_rew_per_step": float(
                (rew / np.maximum(length, 1)).mean()),
            "openloop_eplen_mean": float(length.mean()),
        }
        rows.append(row)
        print(f"{name:16s} fps={row['clip_fps']:5.1f} loop={row['loop']:5s}"
              f" 1step r={row['onestep_reward_mean']:.3f}"
              f" (min {row['onestep_reward_min']:.3f},"
              f" done {row['onestep_done_frac']:.2f})"
              f" openloop r/step={row['openloop_rew_per_step']:.3f}"
              f" len={row['openloop_eplen_mean']:.0f}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
