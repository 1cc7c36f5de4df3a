#!/usr/bin/env python3
"""Query actions from a built agent — the reference's
``dp_policy_testing/GetAction.py``: build an RLWorld from an arg file
(``--arg_file args/run_humanoid3d_walk_args.txt`` format) or a default PPO
spec, query with a zero state, print the action and its shape."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arg-file", default=None)
    p.add_argument("--state-size", type=int, default=197)
    p.add_argument("--action-size", type=int, default=36)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from deepmimic_mujoco_tpu.dp_policy.rl_world import ActionGiver, RLWorld
    from deepmimic_mujoco_tpu.utils.arg_parser import ArgParser

    if args.arg_file:
        giver = ActionGiver(args.arg_file, args.state_size, args.action_size)
        world = giver.world
    else:
        # default: one PPO agent from the built-in spec
        from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent

        parser = ArgParser()
        world = RLWorld(parser, args.state_size, args.action_size)
        agent = PPOAgent(args.state_size, args.action_size)
        world.agents = [agent]
        world.agent_params = [agent.init(jax.random.PRNGKey(0))]

    state = np.zeros(args.state_size, np.float32)
    ac = world.get_action(0, state)
    print("action:", np.round(ac[:8], 4), "...")
    print("shape:", ac.shape)


if __name__ == "__main__":
    main()
