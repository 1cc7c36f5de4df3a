"""Gym-``Humanoid-v2``-style locomotion env over the DeepMimic humanoid
(reference: /root/reference/src/dp_env_test.py).

reward = 0.25·Δcom_x/dt − 0.1·Σctrl² − min(0.5e-6·Σcfrc², 10) + 5.0 alive
(dp_env_test.py:39-52); termination on root height outside (0.80, 2.0);
frame_skip 5; noise reset around standing.

Observation mirrors the reference's [qpos[2:], qvel, cinert, cvel,
qfrc_actuator, cfrc_ext] stack (dp_env_test.py:30-37) with our engine's
equivalents: cinert is the 10-value per-body COM inertia summary, cvel the
per-body spatial velocity, cfrc_ext the per-body floor-contact wrench
accumulated from the constraint solver's forces.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.physics import build_humanoid, engine, kinematics
from deepmimic_mujoco_tpu.physics import collision, dynamics
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat


class HumanoidTestEnv:
    action_size = 28

    def __init__(self, model: Optional[PhysicsModel] = None, n_substeps: int = 5,
                 reset_noise: float = 0.01):
        self.model = model if model is not None else build_humanoid()
        self.n_substeps = n_substeps
        self.reset_noise = reset_noise
        nb = self.model.nbody
        self.observation_size = 33 + 34 + 10 * nb + 6 * nb + 34 + 6 * nb

    def _features(self, qpos, qvel, ctrl):
        kin = kinematics.fk(self.model, qpos)
        com = kinematics.mass_center(self.model, kin)
        # cinert: [mass, m*com(3), I_world upper-tri(6)] per body
        iw = dynamics.world_inertia(self.model, kin)
        m = self.model.body_mass
        cinert = jnp.concatenate(
            [
                m[:, None],
                m[:, None] * kin.xcom,
                iw[:, [0, 1, 2, 0, 0, 1], [0, 1, 2, 1, 2, 2]],
            ],
            axis=1,
        )
        omega, v_com, _, _ = dynamics.body_velocities(self.model, kin, qvel)
        cvel = jnp.concatenate([omega, v_com], axis=1)
        qfrc_act = dynamics.actuator_force(self.model, ctrl)
        # external contact wrench per body from floor candidates
        contacts = collision.floor_contacts(self.model, kin)
        limits = collision.joint_limits(self.model, qpos)
        fwd = engine.forward(self.model, qpos, qvel, ctrl)
        nc = self.model.ncand
        f = fwd.contact_force[: nc * 3].reshape(nc, 3)
        # world-frame force: rows were [z, x, y]
        f_world = f[:, jnp.array([1, 2, 0])]
        cfrc = jnp.zeros((self.model.nbody, 6), qpos.dtype)
        cfrc = cfrc.at[self.model.cand_body, 3:].add(f_world)
        p_w = kin.xpos[self.model.cand_body] + quat.rotate(
            kin.xquat[self.model.cand_body], self.model.cand_pos)
        torque = jnp.cross(p_w - kin.xcom[self.model.cand_body], f_world)
        cfrc = cfrc.at[self.model.cand_body, :3].add(torque)
        return kin, com, cinert, cvel, qfrc_act, cfrc

    def _obs(self, qpos, qvel, ctrl):
        _, _, cinert, cvel, qfrc_act, cfrc = self._features(qpos, qvel, ctrl)
        return jnp.concatenate([
            qpos[2:], qvel, cinert.reshape(-1), cvel.reshape(-1),
            qfrc_act, cfrc.reshape(-1),
        ])

    def reset(self, key: jax.Array) -> EnvState:
        k1, k2, key = jax.random.split(key, 3)
        c = self.reset_noise
        qpos = self.model.qpos0 + jax.random.uniform(k1, (self.model.nq,), minval=-c, maxval=c)
        qvel = jax.random.uniform(k2, (self.model.nv,), minval=-c, maxval=c)
        zero = jnp.zeros((), jnp.int32)
        return EnvState(
            qpos=qpos, qvel=qvel, obs=self._obs(qpos, qvel, jnp.zeros(28)),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=zero, init_idx=zero, step_count=zero, key=key,
        )

    # the reference aliases noise reset for this env
    reset_init = reset

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        kin0 = kinematics.fk(self.model, state.qpos)
        com_before = kinematics.mass_center(self.model, kin0)[0]
        qpos, qvel = engine.step(
            self.model, state.qpos, state.qvel, action, n_substeps=self.n_substeps
        )
        kin, com, cinert, cvel, qfrc_act, cfrc = self._features(qpos, qvel, action)
        obs = jnp.concatenate([
            qpos[2:], qvel, cinert.reshape(-1), cvel.reshape(-1),
            qfrc_act, cfrc.reshape(-1),
        ])
        lin_vel_cost = 0.25 * (com[0] - com_before) / self.model.dt
        quad_ctrl_cost = 0.1 * jnp.sum(jnp.square(action))
        quad_impact_cost = jnp.minimum(0.5e-6 * jnp.sum(jnp.square(cfrc)), 10.0)
        reward = lin_vel_cost - quad_ctrl_cost - quad_impact_cost + 5.0
        done = (qpos[2] < 0.8) | (qpos[2] > 2.0)
        return EnvState(
            qpos=qpos, qvel=qvel, obs=obs, reward=reward, done=done,
            mocap_idx=state.mocap_idx, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key,
        )
