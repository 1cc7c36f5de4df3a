"""Gymnasium-API shim over the functional envs (host-side convenience /
parity-testing surface, mirroring the reference's gym envs and its
installable packages /root/reference/src/dp_env/,
/root/reference/src/mujoco/humanoid_deepmimic/)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _HAS_GYM = True
except Exception:  # pragma: no cover
    gymnasium = None
    _HAS_GYM = False


class GymEnv(gymnasium.Env if _HAS_GYM else object):
    """Wrap a functional env into the gymnasium single-env API.

    reset() uses mocap RSI (reference ``reset_model``); pass
    ``options={"init": True}`` for the noise reset (``reset_model_init``)."""

    metadata = {"render_modes": []}

    def __init__(self, env, seed: int = 0):
        self.fenv = env
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)
        self._reset_init = jax.jit(getattr(env, "reset_init", env.reset))
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        if _HAS_GYM:
            hi = np.inf * np.ones(env.observation_size, np.float32)
            self.observation_space = spaces.Box(-hi, hi, dtype=np.float32)
            self.action_space = spaces.Box(
                -1.0, 1.0, shape=(env.action_size,), dtype=np.float32
            )

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        init = bool(options and options.get("init"))
        self._state = (self._reset_init if init else self._reset)(sub)
        return np.asarray(self._state.obs), {}

    def step(self, action):
        self._state = self._step(self._state, jnp.asarray(action, jnp.float32))
        s = self._state
        return (
            np.asarray(s.obs),
            float(s.reward),
            bool(s.done),
            False,
            {"mocap_idx": int(s.mocap_idx)},
        )

    @property
    def state(self):
        return self._state


def register_gym_envs() -> None:
    """Register the envs with gymnasium — the reference ships installable gym
    packages registering 'HumanoidDeepMimic-v0' etc.
    (/root/reference/src/mujoco/humanoid_deepmimic/__init__.py:1-9)."""
    if not _HAS_GYM:
        return
    from gymnasium.envs.registration import register, registry

    specs = {
        "HumanoidDeepMimic-v0": {"entry": "DPEnvV3", "kwargs": {}},
        "HumanoidDeepMimicExtraHard-v0": {
            "entry": "DPEnvV3", "kwargs": {"reward_mode": "imitation"}},
        "DPEnvV3-v0": {"entry": "DPEnvV3", "kwargs": {}},
        "DPEnvV2-v0": {"entry": "DPEnvV2", "kwargs": {}},
        "DPEnvV1-v0": {"entry": "DPEnvV1", "kwargs": {}},
    }
    for env_id, spec in specs.items():
        if env_id in registry:
            continue
        register(
            id=env_id,
            entry_point=lambda entry=spec["entry"], kw=spec["kwargs"], **kwargs:
                make(entry, **{**kw, **kwargs}),
        )


def make(env_id: str = "DPEnvV3", **kwargs) -> "GymEnv":
    """Registry-style constructor: DPEnvV1/V2/V3, HumanoidTest."""
    from deepmimic_mujoco_tpu.envs import DPEnvV1, DPEnvV2, DPEnvV3, HumanoidTestEnv

    envs = {
        "DPEnvV1": DPEnvV1,
        "DPEnvV2": DPEnvV2,
        "DPEnvV3": DPEnvV3,
        "HumanoidDeepMimic-v0": DPEnvV3,
        "HumanoidTest": HumanoidTestEnv,
    }
    seed = kwargs.pop("seed", 0)
    return GymEnv(envs[env_id](**kwargs), seed=seed)
