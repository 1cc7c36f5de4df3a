"""DPEnv v2 — pose-reward imitation env
(reference: /root/reference/src/dp_env_v2.py).

Semantics preserved:
* physics dt = 0.002, frame_skip = 6 substeps per control step
  (dp_env_v2.xml:9; dp_env_v2.py:59,175)
* obs = qpos[2:] ‖ qvel (67-D; x,y of root dropped) (dp_env_v2.py:62-66)
* reward = exp(-2·Σ|qpos[3:] − ref[3:]|) − 0.1·Σctrl²  (dp_env_v2.py:159,180-183)
* mocap cursor: idx_mocap = (idx_curr + idx_init) mod T, idx_curr increments
  once per control step (dp_env_v2.py:130-131,176)
* termination on root height qpos[2] outside (0.7, 2.0) (dp_env_v2.py:190-193)
* reset: RSI to a random frame (dp_env_v2.py:202-208)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import rewards
from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip
from deepmimic_mujoco_tpu.physics import build_humanoid, engine
from deepmimic_mujoco_tpu.physics.model import PhysicsModel


class DPEnvV2:
    observation_size = 67
    action_size = 28

    def __init__(
        self,
        clip: str | MocapClip = "walk",
        model: Optional[PhysicsModel] = None,
        n_substeps: int = 6,
    ):
        self.model = model if model is not None else build_humanoid(dt=0.002)
        if not isinstance(clip, MocapClip):
            clip = load_clip(clip)
        self.clip = clip
        self.clip_len = len(clip)
        self.clip_qpos = jnp.asarray(clip.qpos, jnp.float32)
        self.clip_qvel = jnp.asarray(clip.qvel, jnp.float32)
        self.n_substeps = n_substeps

    def _obs(self, qpos, qvel):
        return jnp.concatenate([qpos[2:], qvel])

    def reset(self, key: jax.Array) -> EnvState:
        k_idx, key = jax.random.split(key)
        idx = jax.random.randint(k_idx, (), 0, self.clip_len)
        qpos, qvel = self.clip_qpos[idx], self.clip_qvel[idx]
        return EnvState(
            qpos=qpos, qvel=qvel, obs=self._obs(qpos, qvel),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=jnp.zeros((), jnp.int32),  # idx_curr starts at 0
            init_idx=idx, step_count=jnp.zeros((), jnp.int32), key=key,
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        qpos, qvel = engine.step(
            self.model, state.qpos, state.qvel, action, n_substeps=self.n_substeps
        )
        idx_curr = state.mocap_idx + 1
        idx_mocap = (idx_curr + state.init_idx) % self.clip_len
        ref = self.clip_qpos[idx_mocap]
        err = rewards.config_l1_error(qpos[3:], ref[3:])
        reward_obs = jnp.exp(-rewards.SCALE_ERR * rewards.SCALE_POSE * err)
        reward_acs = jnp.sum(jnp.square(action))
        reward = reward_obs - 0.1 * reward_acs
        done = (qpos[2] < 0.7) | (qpos[2] > 2.0)
        return EnvState(
            qpos=qpos, qvel=qvel, obs=self._obs(qpos, qvel),
            reward=reward, done=done,
            mocap_idx=idx_curr, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key,
        )
