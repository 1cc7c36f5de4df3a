"""Vectorized env batch — the TPU-native replacement for the reference's
process-per-env parallelism (``SubprocVecEnv``,
/root/reference/src/utils/vec_env/subproc_vec_env.py) and for its
one-env-per-MPI-rank sampling (trpo.py:27-80).

Thousands of envs run in lockstep inside one jitted program via ``vmap``;
auto-reset on done matches the training loop's semantics (reset to the
*noise* initial state after a done — trpo.py:78-79 — or to a mocap RSI frame,
selectable)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs.types import EnvState


class VectorEnv:
    """Batches a functional env over ``num_envs`` instances.

    ``autoreset``: "init" (noise reset, the reference training behaviour),
    "rsi" (random mocap frame), or "none".
    """

    def __init__(self, env, num_envs: int, autoreset: str = "init"):
        self.env = env
        self.num_envs = num_envs
        self.autoreset = autoreset
        if autoreset == "init" and not hasattr(env, "reset_init"):
            self.autoreset = "rsi"

    @property
    def observation_size(self):
        return self.env.observation_size

    @property
    def action_size(self):
        return self.env.action_size

    @partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array) -> EnvState:
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    @partial(jax.jit, static_argnums=0)
    def reset_init(self, key: jax.Array) -> EnvState:
        keys = jax.random.split(key, self.num_envs)
        fn = getattr(self.env, "reset_init", self.env.reset)
        return jax.vmap(fn)(keys)

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Step all envs; envs that finished are replaced by fresh resets
        (their terminal obs/reward/done remain visible in the returned state
        for the current transition — the rollout reads them before the next
        step, matching the reference generator's ordering)."""
        next_state = jax.vmap(self.env.step)(state, actions)
        if self.autoreset == "none":
            return next_state

        def resample(s: EnvState) -> EnvState:
            k_new = jax.vmap(lambda k: jax.random.split(k)[0])(s.key)
            if self.autoreset == "init":
                fresh = jax.vmap(self.env.reset_init)(k_new)
            else:
                fresh = jax.vmap(self.env.reset)(k_new)
            done = s.done

            def pick(new, old):
                mask = done.reshape((-1,) + (1,) * (old.ndim - 1))
                return jnp.where(mask, new, old)

            reset_state = jax.tree.map(pick, fresh, s)
            # keep the transition's obs/reward/done visible; swap state fields
            return EnvState(
                qpos=reset_state.qpos, qvel=reset_state.qvel,
                obs=reset_state.obs, reward=s.reward, done=s.done,
                mocap_idx=reset_state.mocap_idx, init_idx=reset_state.init_idx,
                step_count=reset_state.step_count, key=reset_state.key,
            )

        return resample(next_state)
