#!/usr/bin/env python3
"""PPO training CLI — trains the original-stack PPO agent
(fc_2layers_1024units, JSON agent-spec hyperparameters, replay-buffer update
cadence) on our envs.

The reference's PPO training loop is only reachable inside the original C++
driver (SURVEY.md §3.5); this CLI provides the equivalent entry point:

  # the original training surface: 197-D record_state + 36-D PD actions
  python -m deepmimic_mujoco_tpu.cli.train_ppo --surface deepmimic \
      --motion walk --num-iters 100

  # the repo's DPEnvV3 (56-D obs / 28-D torque), standup task
  python -m deepmimic_mujoco_tpu.cli.train_ppo --surface v3 --motion walk
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--surface", default="deepmimic",
                   choices=["deepmimic", "v3"],
                   help="deepmimic = the original 197-D record_state / 36-D "
                        "PD-target surface (rl_agent.py:207-214); v3 = the "
                        "repo's DPEnvV3 obs/torque surface")
    p.add_argument("--reward-mode", default=None,
                   help="default: imitation_dm on the deepmimic surface, "
                        "alive on v3")
    p.add_argument("--agent-spec", default=None,
                   help="JSON agent spec (ct_agent_humanoid_ppo.txt format)")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--num-iters", type=int, default=100)
    p.add_argument("--max-episode-steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test-every", type=int, default=10)
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--log-dir", default="log_tmp")
    p.add_argument("--checkpoint-dir", default="checkpoint_tmp")
    p.add_argument("--resume", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent
    from deepmimic_mujoco_tpu.dp_policy.rl_agent import RLAgentDriver
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.utils import logger

    spec = None
    if args.agent_spec:
        with open(args.agent_spec) as f:
            spec = json.load(f)

    if args.surface == "deepmimic":
        from deepmimic_mujoco_tpu.envs import DeepMimicSurfaceEnv

        env = DeepMimicSurfaceEnv(
            clip=args.motion,
            reward_mode=args.reward_mode or "imitation_dm",
            max_episode_steps=args.max_episode_steps)
        # agent construction bootstraps the normalizers from the env's
        # offset/scale/group builders (rl_agent.py:222-234)
        agent = PPOAgent.for_env(env, spec=spec, reward_bounds=(0.0, 1.0))
    else:
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip=args.motion,
                      reward_mode=args.reward_mode or "alive")
        bounds = (np.asarray(env.model.ctrl_range)[:, 0],
                  np.asarray(env.model.ctrl_range)[:, 1])
        agent = PPOAgent(env.observation_size, env.action_size, spec=spec,
                         action_bounds=bounds, reward_bounds=(0.0, 1.0))
    driver = RLAgentDriver(env, agent, num_envs=args.num_envs,
                           seed=args.seed)

    name = f"{args.surface}/ppo-{args.motion}-{args.seed}"
    logger.configure(os.path.join(args.log_dir, name))

    params = agent.init(jax.random.PRNGKey(args.seed))
    if args.resume:
        params = checkpoint.load(args.resume, params)
    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.num_envs)
    env_state = jax.vmap(env.reset)(keys)

    ckpt = os.path.join(args.checkpoint_dir, name, "ppo_params")
    tstart = time.time()
    for it in range(args.num_iters):
        params, env_state, metrics = driver.train_iteration(params, env_state)
        logger.record_tabular("Iter", it)
        for k, v in metrics.items():
            logger.record_tabular(k, v)
        logger.record_tabular("Samples", float(params["sample_count"]))
        logger.record_tabular("TimeElapsed", time.time() - tstart)
        if args.test_every and (it + 1) % args.test_every == 0:
            ret, length = driver.test_episodes(params, n_episodes=16)
            logger.record_tabular("Test_Return", ret)
            logger.record_tabular("Test_Length", length)
        if args.save_every and (it + 1) % args.save_every == 0:
            checkpoint.save(ckpt, params)
        logger.dump_tabular()

    checkpoint.save(ckpt, params)
    print("saved", ckpt)


if __name__ == "__main__":
    main()
