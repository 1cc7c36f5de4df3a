"""Observation/return normalizing wrapper for the vectorized env —
the reference's ``VecNormalize``
(/root/reference/src/utils/vec_env/vec_normalize.py:6-42): running-stat
normalization of observations and discounted returns, clipped to ±10.

Functional: normalization state is carried explicitly so the wrapper stays
jit/vmap-safe."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.utils import running_stats


class VecNormalizeState(NamedTuple):
    env_state: EnvState
    ob_rms: running_stats.RunningMeanStd
    ret_rms: running_stats.RunningMeanStd
    ret: jnp.ndarray  # (B,) running discounted returns


class VecNormalize:
    def __init__(self, venv, ob: bool = True, ret: bool = True,
                 clipob: float = 10.0, cliprew: float = 10.0,
                 gamma: float = 0.99):
        self.venv = venv
        self.norm_ob = ob
        self.norm_ret = ret
        self.clipob = clipob
        self.cliprew = cliprew
        self.gamma = gamma

    def reset(self, key) -> VecNormalizeState:
        env_state = self.venv.reset(key)
        ob_rms = running_stats.init((self.venv.observation_size,))
        ret_rms = running_stats.init(())
        ob_rms = running_stats.update(ob_rms, env_state.obs)
        return VecNormalizeState(
            env_state=env_state, ob_rms=ob_rms, ret_rms=ret_rms,
            ret=jnp.zeros(self.venv.num_envs, jnp.float32))

    def observe(self, state: VecNormalizeState) -> jnp.ndarray:
        obs = state.env_state.obs
        if not self.norm_ob:
            return obs
        return jnp.clip(
            (obs - state.ob_rms.mean) / state.ob_rms.std,
            -self.clipob, self.clipob)

    def step(self, state: VecNormalizeState, actions):
        env_state = self.venv.step(state.env_state, actions)
        ret = state.ret * self.gamma + env_state.reward
        ob_rms = running_stats.update(state.ob_rms, env_state.obs) \
            if self.norm_ob else state.ob_rms
        ret_rms = running_stats.update(state.ret_rms, ret) \
            if self.norm_ret else state.ret_rms
        rew = env_state.reward
        if self.norm_ret:
            rew = jnp.clip(rew / ret_rms.std, -self.cliprew, self.cliprew)
        ret = jnp.where(env_state.done, 0.0, ret)
        new_state = VecNormalizeState(
            env_state=env_state, ob_rms=ob_rms, ret_rms=ret_rms, ret=ret)
        return new_state, self.observe(new_state), rew, env_state.done
