"""RLWorld + agent builder — the original stack's world/agent harness
(reference: /root/reference/src/dp_policy_testing/learning/rl_world.py,
agent_builder.py, GetAction.py).

Builds agents from JSON agent-spec files (``--agent_files``) and forwards
``get_action(state)``; checkpoints load through our pytree format."""

from __future__ import annotations

import json
from typing import Optional

import jax
import numpy as np

from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent
from deepmimic_mujoco_tpu.utils.arg_parser import ArgParser

# original humanoid3d sizes (rl_agent.py:207-214)
DEFAULT_STATE_SIZE = 197
DEFAULT_ACTION_SIZE = 36


def build_agent(spec: dict, state_size: int, action_size: int,
                **kwargs) -> PPOAgent:
    """AgentBuilder.build_agent (agent_builder.py:7-19)."""
    agent_type = spec.get("AgentType", "PPO")
    if agent_type == "PPO":
        return PPOAgent(state_size, action_size, spec=spec, **kwargs)
    if agent_type == "PG":
        from deepmimic_mujoco_tpu.dp_policy.pg_agent import PGAgent

        return PGAgent(state_size, action_size, spec=spec, **kwargs)
    raise ValueError(f"Unsupported agent type {agent_type!r}")


class RLWorld:
    """Owns the agents; mirrors rl_world.py:8-72."""

    def __init__(self, arg_parser: Optional[ArgParser] = None,
                 state_size: int = DEFAULT_STATE_SIZE,
                 action_size: int = DEFAULT_ACTION_SIZE,
                 seed: int = 0):
        self.arg_parser = arg_parser or ArgParser()
        self.agents: list[PPOAgent] = []
        self.agent_params: list[dict] = []
        self.state_size = state_size
        self.action_size = action_size
        self._key = jax.random.PRNGKey(seed)
        self.build_agents()

    def build_agents(self) -> None:
        agent_files = self.arg_parser.parse_strings("agent_files")
        model_files = self.arg_parser.parse_strings("model_files")
        for i, f in enumerate(agent_files):
            with open(f) as fin:
                spec = json.load(fin)
            agent = build_agent(spec, self.state_size, self.action_size)
            self._key, sub = jax.random.split(self._key)
            params = agent.init(sub)
            if i < len(model_files) and model_files[i] not in ("", "none"):
                # fail fast on a missing checkpoint — silently evaluating a
                # fresh random agent masquerades as a (bad) real result.
                # Pass 'none' to run without a model.
                from deepmimic_mujoco_tpu.io_utils import checkpoint

                params = checkpoint.load(model_files[i], params)
            self.agents.append(agent)
            self.agent_params.append(params)

    def get_action(self, agent_id: int, state) -> np.ndarray:
        """rl_world.get_action → agent._decide_action (deterministic mean)."""
        agent = self.agents[agent_id]
        params = self.agent_params[agent_id]
        return np.asarray(agent.get_action(params, np.asarray(state, np.float32)))


class ActionGiver:
    """GetAction.py:28-43 — query actions from a built world."""

    def __init__(self, arg_file: Optional[str] = None,
                 state_size: int = DEFAULT_STATE_SIZE,
                 action_size: int = DEFAULT_ACTION_SIZE):
        parser = ArgParser()
        if arg_file:
            parser.load_file(arg_file)
        self.world = RLWorld(parser, state_size, action_size)

    def get_ac(self, state, goal=None) -> np.ndarray:
        return self.world.get_action(0, state)
