"""DeepMimic core-API facade — the original C++ ``DeepMimicCore`` RL
interface implemented over our JAX engine
(reference: /root/reference/src/mujoco/mujoco_env.py, src/env/env.py — the
API the original learning stack calls: record_state/set_action/calc_reward/
check_terminate plus the normalization-group/offset/scale/bound builders).

State layout (197-D, mujoco_env.py:91-124), quirks preserved:
* state[0] = phase, left at 0 (the reference never writes it)
* state[1] = root xpos[1] — the *lateral* coordinate (a Y-up habit carried
  into the Z-up frame; kept for parity)
* per BODY_DEFS body (15, wrists resolved to their geoms): xpos − root_xpos
  (3) + xquat (4); then per body the 6-D spatial velocity [ω, v_com]
  (MuJoCo ``cvel`` analogue).

set_action (36-D DeepMimic PD targets: 8 spherical axis-angle 4D + 4 hinge
scalars in DP order) → stable-PD torque τ = kp·p_err + kd·(p_err/dt − qvel)
(mujoco_interface.action2torque, mujoco_interface.py:97-107) written as ctrl.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.mocap.constants import (
    BODY_DEFS,
    BODY_JOINTS,
    BODY_JOINTS_IN_DP_ORDER,
    DOF_DEF,
    kp_kd_vectors,
)
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip
from deepmimic_mujoco_tpu.physics import build_humanoid, dynamics, engine, kinematics
from deepmimic_mujoco_tpu.utils import quaternion as quat

STATE_SIZE = 197
ACTION_SIZE = 36
GOAL_SIZE = 0


class ActionSpace(enum.Enum):
    """Action-space kind reported by :meth:`DeepMimicEnv.get_action_space`
    (reference: /root/reference/src/env/action_space.py:1-6; the mujoco port
    returns the raw value 1 = Continuous, mujoco_env.py:129-130)."""

    Null = 0
    Continuous = 1
    Discrete = 2


def _dp_action_slices():
    """DP-order action layout: 4 per spherical joint (angle, axis), 1 per
    revolute."""
    out = {}
    off = 0
    for j in BODY_JOINTS_IN_DP_ORDER:
        n = 4 if DOF_DEF[j] == 3 else 1
        out[j] = (off, n)
        off += n
    assert off == ACTION_SIZE
    return out


_ACTION_SLICES = _dp_action_slices()


class DeepMimicEnv:
    """Single-env, host-friendly facade (the original API is imperative);
    the underlying stepping is the jitted JAX engine.

    ``reward_mode``: 'stub' reproduces the reference's TODO placeholder
    (random reward, mujoco_env.py:184-186); 'imitation' scores the real
    DeepMimic reward against the mocap cursor (which ``update`` advances
    with sim time).  ``check_terminate`` reports FAIL on fall contact
    (original --fall_contact_bodies; the reference's port returns a
    constant 2, mujoco_env.py:193-194)."""

    def __init__(self, clip: str | MocapClip = "walk", model=None,
                 reward_mode: str = "stub", seed: int = 0):
        self.model = model if model is not None else build_humanoid()
        if not isinstance(clip, MocapClip):
            clip = load_clip(clip)
        self.mocap = clip
        self.reward_mode = reward_mode
        self.state_size = STATE_SIZE
        self.action_size = ACTION_SIZE
        kp, kd = kp_kd_vectors()
        self._kp = jnp.asarray(kp, jnp.float32)
        self._kd = jnp.asarray(kd, jnp.float32)
        self._rng = np.random.RandomState(seed)
        self.qpos = jnp.asarray(self.model.qpos0)
        self.qvel = jnp.zeros(self.model.nv, jnp.float32)
        self.ctrl = jnp.zeros(self.model.nu, jnp.float32)
        self._step_jit = jax.jit(
            lambda qp, qv, c, n: engine.step(self.model, qp, qv, c, n_substeps=n),
            static_argnums=3)
        # pure-surface twin: reward / termination / phase come from the
        # same functions the trainable DeepMimicSurfaceEnv uses
        from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
            DeepMimicSurfaceEnv,
        )

        self._surface = DeepMimicSurfaceEnv(
            clip=clip, model=self.model,
            reward_mode="imitation_dm" if reward_mode != "stub" else "alive")
        self._sim_time = 0.0
        self._reward_jit = None
        if reward_mode != "stub":
            env = self._surface

            def _reward(qp, qv, idx):
                kin = kinematics.fk(env.model, qp)
                i, cycles = env._clip_index(idx)
                offset = cycles * env.cycle_offset
                ee = kinematics.geom_world_pos(env.model, kin)[env._ee_geoms]
                com_vel = kinematics.com_velocity(env.model, kin, qv)
                from deepmimic_mujoco_tpu.envs import rewards

                return rewards.deepmimic_reward(
                    qp, qv, env.clip_qpos[i].at[0:3].add(offset),
                    env.clip_qvel[i],
                    ee_pos=ee, ref_ee_pos=env.clip_ee[i] + offset,
                    com_vel=com_vel, ref_com_vel=env.clip_com_vel[i])

            self._reward_jit = jax.jit(_reward)
        self._fall_jit = jax.jit(
            lambda qp: self._surface.fall_contact(
                kinematics.fk(self.model, qp)))
        # body index per BODY_DEFS entry; wrists map to their elbow geoms
        self._bodydef_body = []
        self._bodydef_geom = []
        for name in BODY_DEFS:
            if name.endswith("wrist"):
                self._bodydef_body.append(self.model.body_index(
                    name.replace("wrist", "elbow")))
                self._bodydef_geom.append(self.model.geom_index(name))
            else:
                self._bodydef_body.append(self.model.body_index(name))
                self._bodydef_geom.append(self.model.geom_index(name))
        self._bodydef_body = np.asarray(self._bodydef_body, np.int32)
        self._bodydef_geom = np.asarray(self._bodydef_geom, np.int32)

    # --- scene interface (env/env.py) ---
    def init(self):
        pass

    def reset(self):
        self.qpos = jnp.asarray(self.model.qpos0)
        self.qvel = jnp.zeros(self.model.nv, jnp.float32)
        self._sim_time = 0.0

    def update(self, timestep: float) -> None:
        n = max(1, int(round(timestep / self.model.dt)))
        self.qpos, self.qvel = self._step_jit(self.qpos, self.qvel, self.ctrl, n)
        self._sim_time += n * self.model.dt

    def shutdown(self):
        pass

    def is_done(self):
        return False

    @property
    def mocap_idx(self) -> int:
        """Mocap cursor from accumulated sim time (the original core indexes
        its motion by time; mocap_v2.play, mocap_v2.py:151-182)."""
        # round: the sim dt (0.0166) does not divide the clip dt (0.0333)
        # exactly in float
        return int(round(self._sim_time / self.mocap.dt))

    def get_num_update_substeps(self):
        """Sim substeps per 30 Hz control decision — from the controller
        spec's UpdateRate (assets/controllers/humanoid3d_ctrl.txt,
        "UpdateRate": 30) and the sim dt, rather than the reference's
        hardcoded 32 (mujoco_env.py:84-85)."""
        return max(1, int(round((1.0 / 30.0) / self.model.dt)))

    # --- rl interface ---
    def is_rl_scene(self):
        return True

    def get_num_agents(self):
        return 1

    def need_new_action(self, agent_id: int = 0):
        return True

    def record_state(self, agent_id: int = 0) -> np.ndarray:
        kin = kinematics.fk(self.model, self.qpos)
        geom_pos = kinematics.geom_world_pos(self.model, kin)
        omega, v_com, _, _ = dynamics.body_velocities(self.model, kin, self.qvel)

        xpos = np.asarray(geom_pos)[self._bodydef_geom]
        # use geom anchors for positions; body frames for quats/velocities
        xpos_body = np.asarray(kin.xpos)[self._bodydef_body]
        xquat = np.asarray(kin.xquat)[self._bodydef_body]
        cvel = np.concatenate(
            [np.asarray(omega), np.asarray(v_com)], axis=1)[self._bodydef_body]
        # non-wrist entries use the body frame origin; wrists their geom
        is_wrist = np.array([n.endswith("wrist") for n in BODY_DEFS])
        pos = np.where(is_wrist[:, None], xpos, xpos_body)

        root = pos[0]
        state = np.full(self.state_size, np.nan)
        # phase from the sim-time mocap cursor (the reference port leaves it
        # 0, mujoco_env.py:105-107; the original C++ core writes it)
        state[0] = (self.mocap_idx % len(self.mocap)) / len(self.mocap)
        state[1] = root[1]                  # lateral coord (reference quirk)
        idx = 2
        for i in range(len(BODY_DEFS)):
            state[idx:idx + 3] = pos[i] - root
            idx += 3
            state[idx:idx + 4] = xquat[i]
            idx += 4
        for i in range(len(BODY_DEFS)):
            state[idx:idx + 6] = cvel[i]
            idx += 6
        assert idx == self.state_size
        return state

    def record_goal(self, agent_id: int = 0) -> np.ndarray:
        return np.array([1])

    def set_action(self, agent_id: int, action) -> None:
        """PD targets → torques → ctrl (mujoco_env.py:132-135)."""
        torque = np.asarray(self.action2torque(np.asarray(action)))
        gear = np.asarray(self.model.actuator_gear)
        self.ctrl = jnp.asarray(torque / gear, jnp.float32)

    def action2torque(self, action: np.ndarray) -> np.ndarray:
        """Stable-PD torque from DP-order targets
        (mujoco_interface.py:97-107): p_err from target vs current per dof,
        vel = p_err/dt, τ = kp·p_err + kd·(vel − qvel)."""
        qpos = np.asarray(self.qpos)
        qvel = np.asarray(self.qvel)
        p_err = np.zeros(self.model.nu)
        off_mj_pos = 7
        off_mj_vel = 6
        for j in BODY_JOINTS:
            a_off, a_n = _ACTION_SLICES[j]
            if DOF_DEF[j] == 3:
                angle = action[a_off]
                axis = action[a_off + 1:a_off + 4]
                nrm = np.linalg.norm(axis)
                axis = axis / nrm if nrm > 1e-9 else np.array([1.0, 0, 0])
                q_tar = np.concatenate(
                    [[np.cos(angle / 2)], np.sin(angle / 2) * axis])
                e_cur = qpos[off_mj_pos:off_mj_pos + 3]
                q_cur = np.asarray(quat.quat_from_euler_rxyz(jnp.asarray(e_cur)))
                d = np.asarray(quat.log_map(
                    quat.mul(quat.conj(jnp.asarray(q_cur)), jnp.asarray(q_tar))))
                p_err[off_mj_vel - 6:off_mj_vel - 6 + 3] = d
                off_mj_pos += 3
                off_mj_vel += 3
            else:
                p_err[off_mj_vel - 6] = action[a_off] - qpos[off_mj_pos]
                off_mj_pos += 1
                off_mj_vel += 1
        kp = np.asarray(self._kp)
        kd = np.asarray(self._kd)
        vel = p_err / self.model.dt
        v_err = vel - qvel[6:]
        return kp * p_err + kd * v_err

    def get_state_size(self, agent_id: int = 0):
        return self.state_size

    def get_goal_size(self, agent_id: int = 0):
        return GOAL_SIZE

    def get_action_size(self, agent_id: int = 0):
        return self.action_size

    def get_action_space(self, agent_id: int = 0) -> ActionSpace:
        """Continuous 36-D PD-target actions (env.py:98 /
        mujoco_env.py:129-130 return the raw enum value 1)."""
        return ActionSpace.Continuous

    # --- normalization builders (mujoco_env.py:149-182) ---
    def build_state_offset(self, agent_id: int = 0):
        return np.zeros(self.state_size)

    def build_state_scale(self, agent_id: int = 0):
        return np.ones(self.state_size)

    def build_goal_offset(self, agent_id: int = 0):
        return np.array([])

    def build_goal_scale(self, agent_id: int = 0):
        return np.array([])

    def build_action_offset(self, agent_id: int = 0):
        return np.zeros(self.action_size)

    def build_action_scale(self, agent_id: int = 0):
        return np.ones(self.action_size)

    def build_action_bound_min(self, agent_id: int = 0):
        return -10 * np.ones(self.action_size)

    def build_action_bound_max(self, agent_id: int = 0):
        return 10 * np.ones(self.action_size)

    def build_state_norm_groups(self, agent_id: int = 0):
        tmp = np.zeros(self.state_size)
        tmp[-1] = 1
        return tmp

    def build_goal_norm_groups(self, agent_id: int = 0):
        return np.array([])

    def calc_reward(self, agent_id: int = 0) -> float:
        if self.reward_mode == "stub":
            # the reference leaves this TODO (mujoco_env.py:184-186)
            return float(self._rng.rand() - 0.5)
        # the real DeepMimic imitation reward against the sim-time mocap
        # cursor (same kernel as DeepMimicSurfaceEnv.step)
        return float(self._reward_jit(
            self.qpos, self.qvel, jnp.asarray(self.mocap_idx, jnp.int32)))

    def is_episode_end(self):
        return False

    def check_terminate(self, agent_id: int = 0):
        """Terminate.FAIL (1) when a non-allowed body touches the floor —
        the original fall-contact termination (--fall_contact_bodies in
        every arg file); NULL (0) otherwise.  The reference port returns a
        constant 2 (mujoco_env.py:193-194); pass ``reward_mode='stub'``
        AND compare against that quirk only if you need bug-parity."""
        return 1 if bool(self._fall_jit(self.qpos)) else 0

    def check_valid_episode(self):
        return True

    def log_val(self, agent_id, val):
        pass

    def set_sample_count(self, count):
        pass

    def set_mode(self, mode):
        pass
