"""RL agent driver — the original stack's ``RLAgent`` act-and-train FSM
(reference: /root/reference/src/dp_policy_testing/learning/rl_agent.py)
wired to our functional envs.

Faithful pieces:
* TRAIN/TEST mode switching (rl_agent.py:370-412)
* updates fire on a sample-count period = BatchSize (rl_agent.py:123-136)
* exploration rate coin-flip per episode-ish decision (ppo_agent.py:147-150)
* distributed episode accounting via psum-style reduction hooks
  (rl_agent.py:521-584) — here the vectorized env IS the worker pool.

The rollout runs as a jitted scan over the vectorized env; collected
segments feed ``PPOAgent.update``.  Terminated paths are treated as FAIL
(value 0 at the boundary), matching the standup task's terminations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent


class Mode:
    TRAIN = 0
    TEST = 1
    TRAIN_END = 2


class RLAgentDriver:
    def __init__(self, env, agent: PPOAgent, num_envs: int = 32,
                 seed: int = 0):
        self.env = env
        self.agent = agent
        self.num_envs = num_envs
        self.mode = Mode.TRAIN
        self._key = jax.random.PRNGKey(seed)
        self.steps_per_rollout = max(1, agent.batch_size // num_envs)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4))
    def _rollout(self, params, env_state, key, explore: bool):
        B = self.num_envs

        def step_fn(carry, _):
            env_state, key = carry
            key, k_act, k_coin = jax.random.split(key, 3)
            ob = env_state.obs
            rate, _ = self.agent.exp_params_at(params["sample_count"])
            exploring = jnp.asarray(explore) & (
                jax.random.uniform(k_coin) < rate)
            ks = jax.random.split(k_act, B)
            a, logp = jax.vmap(
                lambda k, o: self.agent.decide_action(params, k, o, exploring)
            )(ks, ob)
            nxt = jax.vmap(self.env.step)(env_state, a)
            done = nxt.done
            # auto-reset
            k_resets = jax.vmap(lambda k: jax.random.split(k)[0])(nxt.key)
            reset_fn = getattr(self.env, "reset_init", self.env.reset)
            fresh = jax.vmap(reset_fn)(k_resets)

            def pick(new, old):
                m = done.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            env_state2 = jax.tree.map(pick, fresh, nxt)
            return (env_state2, key), (ob, a, logp, nxt.reward, done)

        (env_state, key), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=self.steps_per_rollout)
        return env_state, key, traj

    def _flatten_paths(self, traj, last_obs):
        """(T, B, ...) → env-major flat arrays with path_end flags and one
        bootstrap state row appended."""
        obs, acs, logps, rews, dones = traj
        T, B = rews.shape
        # env-major: (B, T, ...)
        obs_e = jnp.swapaxes(obs, 0, 1).reshape(B * T, -1)
        acs_e = jnp.swapaxes(acs, 0, 1).reshape(B * T, -1)
        logps_e = jnp.swapaxes(logps, 0, 1).reshape(B * T)
        rews_e = jnp.swapaxes(rews, 0, 1).reshape(B * T)
        ends = jnp.swapaxes(dones, 0, 1)
        ends = ends.at[:, -1].set(True)  # segment boundary ends each env's path
        ends_e = ends.reshape(B * T)
        states = jnp.concatenate([obs_e, last_obs[:1]], axis=0)
        return states, acs_e, logps_e, rews_e, ends_e

    # ------------------------------------------------------------------
    def train_iteration(self, params, env_state):
        self._key, k1, k2 = jax.random.split(self._key, 3)
        env_state, _, traj = self._rollout(params, env_state, k1, True)
        states, acs, logps, rews, ends = self._flatten_paths(
            traj, env_state.obs)
        params, metrics = self.agent.update(
            params, k2, states, acs, logps, rews, ends)
        ep_rew = float(jnp.sum(rews)) / max(1.0, float(jnp.sum(ends)))
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["avg_path_reward"] = ep_rew
        return params, env_state, metrics

    def test_episodes(self, params, n_episodes: int = 32,
                      horizon: int = 512) -> tuple[float, float]:
        """TEST-mode evaluation (rl_agent.py:388-397): deterministic policy,
        returns (avg_return, avg_length)."""
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, n_episodes)
        state = jax.vmap(self.env.reset)(keys)

        @jax.jit
        def run(state):
            def step_fn(carry, _):
                st, alive, ret, length = carry
                a = jax.vmap(lambda o: self.agent.get_action(params, o))(st.obs)
                nxt = jax.vmap(self.env.step)(st, a)
                ret = ret + jnp.where(alive, nxt.reward, 0.0)
                length = length + jnp.where(alive, 1, 0)
                alive2 = alive & ~nxt.done
                st2 = jax.tree.map(
                    lambda new, old: jnp.where(
                        alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                    nxt, st)
                return (st2, alive2, ret, length), None

            alive = jnp.ones(n_episodes, bool)
            ret = jnp.zeros(n_episodes, jnp.float32)
            length = jnp.zeros(n_episodes, jnp.int32)
            carry, _ = jax.lax.scan(
                step_fn, (state, alive, ret, length), None, length=horizon)
            return carry[2], carry[3]

        ret, length = run(state)
        return float(jnp.mean(ret)), float(jnp.mean(length))
