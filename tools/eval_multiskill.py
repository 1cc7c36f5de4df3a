#!/usr/bin/env python3
"""Per-skill evaluation of a multi-clip imitation checkpoint
(DPEnvV3Multi): deterministic episodes from RSI starts of EACH clip,
reporting EpLen and reward/step per skill.

    python tools/eval_multiskill.py --ckpt train_ckpt_multiskill_r2/.../trpo_state.npz \
        --motions walk,run,spinkick --episodes 32
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--motions", default="walk,run,spinkick")
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--fixed-logstd", type=float, default=-3.0)
    p.add_argument("--hidden-sizes", default="1024,512")
    p.add_argument("--activation", default="relu")
    p.add_argument("--platform", default=None)
    p.add_argument("--joint-limits", default="xml",
                   choices=["xml", "mocap"],
                   help="must match the checkpoint's training flag")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3Multi
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.models import MlpPolicy

    clips = tuple(args.motions.split(","))
    model = None
    if args.joint_limits == "mocap":
        from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range
        model = mocap_hinge_range()
    env = DPEnvV3Multi(clips=clips, model=model,
                       max_episode_steps=args.horizon)
    hidden = tuple(int(h) for h in args.hidden_sizes.split(","))
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size,
                       fixed_logstd=args.fixed_logstd, hidden_sizes=hidden,
                       activation=args.activation)
    learner = TRPO(env, policy, TRPOConfig())
    state = checkpoint.load(args.ckpt, learner.init(jax.random.PRNGKey(0)))
    params = state.params

    B = args.episodes

    @jax.jit
    def roll(s):
        def step_fn(carry, _):
            s, alive, ep_len, rew_sum = carry
            mean, _ = policy.mean_logstd(params, s.obs)
            nxt = jax.vmap(env.step)(s, mean)
            ep_len = ep_len + jnp.where(alive, 1, 0)
            rew_sum = rew_sum + jnp.where(alive, nxt.reward, 0.0)
            alive2 = alive & ~nxt.done
            s2 = jax.tree.map(
                lambda a, b: jnp.where(
                    alive.reshape((-1,) + (1,) * (a.ndim - 1)), a, b), nxt, s)
            return (s2, alive2, ep_len, rew_sum), None

        carry, _ = jax.lax.scan(
            step_fn, (s, jnp.ones(B, bool), jnp.zeros(B, jnp.int32),
                      jnp.zeros(B, jnp.float32)), None, length=args.horizon)
        _, _, ep_len, rew_sum = carry
        return ep_len, rew_sum

    print(f"{'skill':>10} {'EpLen':>7} {'rew/step':>9}   "
          f"({B} RSI episodes each, deterministic)")
    overall_len, overall_rew = [], []
    for k, name in enumerate(clips):
        keys = jax.random.split(jax.random.PRNGKey(100 + k), B)
        T = int(env.clip_lens[k])
        frames = jnp.asarray(
            np.random.RandomState(k).randint(0, T, size=B))
        s = jax.vmap(lambda key, f: env.reset_at(key, k, f))(keys, frames)
        ep_len, rew_sum = roll(s)
        ep_len = np.asarray(ep_len, float)
        rew_sum = np.asarray(rew_sum)
        rps = rew_sum.sum() / max(ep_len.sum(), 1)
        print(f"{name:>10} {ep_len.mean():7.1f} {rps:9.3f}")
        overall_len.append(ep_len.mean())
        overall_rew.append(rps)
    print(f"{'MEAN':>10} {np.mean(overall_len):7.1f} "
          f"{np.mean(overall_rew):9.3f}")


if __name__ == "__main__":
    main()
