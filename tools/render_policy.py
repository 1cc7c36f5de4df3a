#!/usr/bin/env python3
"""Render a trained imitation policy to video: roll the checkpoint
deterministically from a fixed mocap frame and export the qpos trajectory
through the host MuJoCo renderer (io_utils.video.render_qpos_trajectory).

    python tools/render_policy.py --ckpt train_ckpt_walk_r2/.../trpo_state.npz \
        --motion walk --out figures/walk_policy.avi
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# headless rendering: EGL works in this environment, osmesa does not
os.environ.setdefault("MUJOCO_GL", "egl")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--motion", default="walk")
    p.add_argument("--out", default=None)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--start-frame", type=int, default=0)
    p.add_argument("--hidden-sizes", default="1024,512")
    p.add_argument("--activation", default="relu")
    p.add_argument("--fixed-logstd", type=float, default=-3.0)
    p.add_argument("--control-mode", default="pd_residual")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.io_utils.video import render_qpos_trajectory
    from deepmimic_mujoco_tpu.models import MlpPolicy

    env = DPEnvV3(clip=args.motion, reward_mode="imitation_dm",
                  control_mode=args.control_mode, n_substeps=2,
                  max_episode_steps=args.steps)
    hidden = tuple(int(h) for h in args.hidden_sizes.split(","))
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size,
                       fixed_logstd=args.fixed_logstd, hidden_sizes=hidden,
                       activation=args.activation)
    learner = TRPO(env, policy, TRPOConfig())
    state = checkpoint.load(args.ckpt,
                            learner.init(jax.random.PRNGKey(0)))
    params = state.params

    s = env.reset_at(jax.random.PRNGKey(0), args.start_frame)

    @jax.jit
    def roll(s):
        def step_fn(carry, _):
            s, alive = carry
            mean, _ = policy.mean_logstd(params, s.obs)
            nxt = env.step(s, mean)
            alive2 = alive & ~nxt.done
            s2 = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nxt, s)
            return (s2, alive2), (s.qpos, alive)

        (_, _), (qpos, alive) = jax.lax.scan(
            step_fn, (s, jnp.ones((), bool)), None, length=args.steps)
        return qpos, alive

    qpos, alive = roll(s)
    n = int(np.asarray(alive).sum())
    qpos = np.asarray(qpos)[:max(n, 1)]
    out = args.out or os.path.join(
        REPO, "figures", f"{args.motion}_policy.avi")
    # clip frames are 30 fps; render each control step once
    render_qpos_trajectory(qpos, out, fps=30)
    print(f"rendered {len(qpos)} frames (episode ran {n}/{args.steps}) "
          f"→ {out}")


if __name__ == "__main__":
    main()
