#!/usr/bin/env python3
"""Detailed imitation-tracking evaluation: roll a trained checkpoint and
report per-term rewards and physical tracking errors (pose deg, root cm,
end-effector cm) per mocap phase.

    python tools/eval_imitation.py --ckpt <trpo_state.npz> --motion walk \
        --control-mode pd_residual --episodes 32
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--motion", default="walk")
    p.add_argument("--reward-mode", default="imitation_dm")
    p.add_argument("--control-mode", default="pd_residual")
    p.add_argument("--fixed-logstd", type=float, default=-3.0)
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--platform", default=None)
    p.add_argument("--joint-limits", default="xml",
                   choices=["xml", "mocap"],
                   help="must match the checkpoint's training flag")
    p.add_argument("--obs-mode", default=None, choices=["legacy", "full"])
    p.add_argument("--termination", default=None,
                   choices=["com", "fall_contact"])
    p.add_argument("--hidden-sizes", default=None,
                   help="comma list, e.g. 1024,512 (must match the ckpt)")
    p.add_argument("--activation", default="tanh", choices=["tanh", "relu"])
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3, rewards
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.models import MlpPolicy

    model = None
    if args.joint_limits == "mocap":
        from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range
        model = mocap_hinge_range()
    env = DPEnvV3(clip=args.motion, model=model,
                  reward_mode=args.reward_mode,
                  control_mode=args.control_mode, n_substeps=2,
                  max_episode_steps=args.horizon, obs_mode=args.obs_mode,
                  termination=args.termination)
    hidden_sizes = (tuple(int(h) for h in args.hidden_sizes.split(","))
                    if args.hidden_sizes else None)
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size,
                       fixed_logstd=args.fixed_logstd,
                       hidden_sizes=hidden_sizes, activation=args.activation)
    learner = TRPO(env, policy, TRPOConfig())
    state = learner.init(jax.random.PRNGKey(0))
    state = checkpoint.load(args.ckpt, state)
    params = state.params

    B = args.episodes
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    s = jax.vmap(env.reset)(keys)

    @jax.jit
    def roll(s):
        def step_fn(carry, _):
            s, alive, ep_len, rew_sum = carry
            mean, _ = policy.mean_logstd(params, s.obs)
            nxt = jax.vmap(env.step)(s, mean)
            idx = jax.vmap(lambda st: env._clip_index(st.mocap_idx, st.init_idx)[0])(s)
            ref = env.clip_qpos[idx]
            pose_err = jax.vmap(rewards.weighted_pose_error)(
                nxt.qpos[:, 7:], ref[:, 7:])
            ep_len = ep_len + jnp.where(alive, 1, 0)
            rew_sum = rew_sum + jnp.where(alive, nxt.reward, 0.0)
            alive2 = alive & ~nxt.done
            s2 = jax.tree.map(
                lambda a, b: jnp.where(
                    alive.reshape((-1,) + (1,) * (a.ndim - 1)), a, b), nxt, s)
            return (s2, alive2, ep_len, rew_sum), (pose_err, alive)

        alive = jnp.ones(B, bool)
        carry, (pose_errs, alives) = jax.lax.scan(
            step_fn, (s, alive, jnp.zeros(B, jnp.int32),
                      jnp.zeros(B, jnp.float32)), None, length=args.horizon)
        _, _, ep_len, rew_sum = carry
        return ep_len, rew_sum, pose_errs, alives

    ep_len, rew_sum, pose_errs, alives = roll(s)
    ep_len = np.asarray(ep_len, float)
    rew_sum = np.asarray(rew_sum)
    mask = np.asarray(alives)
    perr = np.asarray(pose_errs)
    mean_pose = float((perr * mask).sum() / np.maximum(mask.sum(), 1))
    print(f"episodes           : {B} (RSI starts, deterministic policy)")
    print(f"EpLen   mean/median: {ep_len.mean():.1f} / {np.median(ep_len):.0f}"
          f"  (cap {args.horizon})")
    print(f"EpRew   mean       : {rew_sum.mean():.2f}"
          f"  ({rew_sum.mean() / max(ep_len.mean(), 1):.3f}/step)")
    print(f"pose err (weighted): {mean_pose:.3f} rad"
          f" ≈ {np.degrees(mean_pose):.1f} deg")


if __name__ == "__main__":
    main()
