#!/usr/bin/env python3
"""PPO training CLI — trains the original-stack PPO agent
(fc_2layers_1024units, JSON agent-spec hyperparameters) on our envs.

The reference's PPO training loop is only reachable inside the original C++
driver (SURVEY.md §3.5); this CLI provides the equivalent entry point:
  python -m deepmimic_mujoco_tpu.cli.train_ppo --motion walk \
      --agent-spec path/to/ct_agent_humanoid_ppo.txt --num-iters 100
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--reward-mode", default="alive")
    p.add_argument("--agent-spec", default=None,
                   help="JSON agent spec (ct_agent_humanoid_ppo.txt format)")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--num-iters", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test-every", type=int, default=10)
    p.add_argument("--log-dir", default="log_tmp")
    p.add_argument("--checkpoint-dir", default="checkpoint_tmp")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent
    from deepmimic_mujoco_tpu.dp_policy.rl_agent import RLAgentDriver
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.utils import logger

    spec = None
    if args.agent_spec:
        with open(args.agent_spec) as f:
            spec = json.load(f)

    env = DPEnvV3(clip=args.motion, reward_mode=args.reward_mode)
    bounds = (np.asarray(env.model.ctrl_range)[:, 0],
              np.asarray(env.model.ctrl_range)[:, 1])
    agent = PPOAgent(env.observation_size, env.action_size, spec=spec,
                     action_bounds=bounds, reward_bounds=(0.0, 1.0))
    driver = RLAgentDriver(env, agent, num_envs=args.num_envs, seed=args.seed)

    name = f"DPEnvV3/ppo-{args.motion}-{args.seed}"
    logger.configure(os.path.join(args.log_dir, name))

    params = agent.init(jax.random.PRNGKey(args.seed))
    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.num_envs)
    env_state = jax.vmap(env.reset)(keys)

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
        logger.dump_tabular()

    ckpt = os.path.join(args.checkpoint_dir, name, "ppo_params")
    checkpoint.save(ckpt, params)
    print("saved", ckpt)


if __name__ == "__main__":
    main()
