"""Functional DeepMimic-surface environment: the original learning stack's
real training interface — 197-D ``record_state`` observations and 36-D
DP-order PD-target actions — as a pure jit/vmap-able env.

This is the surface the original agents actually train on
(/root/reference/src/dp_policy_testing/learning/rl_agent.py:207-214 hardcodes
197/36; /root/reference/src/mujoco/mujoco_env.py:91-135 builds the state and
routes actions through ``action2torque``).  The reference can only *infer*
through it (its training loop needs the original C++ driver); here it is a
first-class batched env, so both the dp_policy PPO stack and TRPO can train
on it.

Faithful pieces:
* state layout = the reference's ``record_state`` (mujoco_env.py:91-124):
  [phase, root coord, 15×(rel-pos3 + quat4), 15×cvel6] = 197; wrists (which
  are geoms, not bodies) use their geom anchor positions.
* actions = DP-order PD targets (8 spherical as axis-angle 4-D + 4 revolute
  scalars = 36, mujoco_interface.py:31-64) tracked by the joint-PD
  controller (action2torque, mujoco_interface.py:97-107) — here re-evaluated
  every physics substep (engine.step_pd).
* termination = fall contact: any non-allowed body touching the floor ends
  the episode (original DeepMimic ``--fall_contact_bodies``,
  /root/reference/src/args/train_humanoid3d_walk_args.txt:20).
* reward = the original imitation reward (rewards.deepmimic_reward).

Deliberate non-quirks (each reference quirk is available via a flag):
* ``state[0]`` carries the real mocap phase (``write_phase=True``); the
  reference port leaves it 0 (mujoco_env.py:105-107), which makes the
  time-indexed imitation reward unlearnable.
* ``state[1]`` carries the root *height*; ``quirk_lateral=True`` restores
  the reference's Y-up habit of writing the lateral coordinate
  (mujoco_env.py:109-111).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.envs import rewards
from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.mocap.constants import (
    BODY_DEFS,
    BODY_JOINTS,
    BODY_JOINTS_IN_DP_ORDER,
    DOF_DEF,
    END_EFFECTORS,
    kp_kd_vectors,
)
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip
from deepmimic_mujoco_tpu.physics import (
    build_humanoid,
    collision,
    dynamics,
    engine,
    kinematics,
)
from deepmimic_mujoco_tpu.utils import quaternion as quat

STATE_SIZE = 197
ACTION_SIZE = 36

# fall-contact body indices (into BODY_DEFS) when no arg file overrides:
# every body except the ankles/feet (5, 11) — the list carried by all
# train_humanoid3d_*_args.txt files
DEFAULT_FALL_CONTACT_BODIES = (0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14)

_ARGS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "..", "assets", "args")


def dp_action_slices() -> dict:
    """DP-order action layout: (offset, width) per joint — 4 per spherical
    (angle + axis), 1 per revolute (mujoco_interface.py:31-64)."""
    out = {}
    off = 0
    for j in BODY_JOINTS_IN_DP_ORDER:
        n = 4 if DOF_DEF[j] == 3 else 1
        out[j] = (off, n)
        off += n
    assert off == ACTION_SIZE
    return out


_ACTION_SLICES = dp_action_slices()


def load_fall_contact_bodies(clip_name: str) -> tuple:
    """Parse ``--fall_contact_bodies`` from the bundled arg file for a clip
    (assets/args/train_humanoid3d_<clip>_args.txt, mirroring
    /root/reference/src/args/); fall back to the standard list."""
    short = clip_name.replace("humanoid3d_", "")
    path = os.path.join(_ARGS_DIR, f"train_humanoid3d_{short}_args.txt")
    try:
        with open(path) as f:
            toks = f.read().split()
    except OSError:
        return DEFAULT_FALL_CONTACT_BODIES
    try:
        # floor-borne skills (getup_facedown/getup_faceup/roll) disable
        # contact-fall termination outright via --enable_char_contact_fall
        # false (reference src/args/train_humanoid3d_getup_facedown_args.
        # txt:20) — that flag wins over any body list
        i = toks.index("--enable_char_contact_fall")
        if toks[i + 1].lower() == "false":
            return ()
    except (ValueError, IndexError):
        pass
    try:
        i = toks.index("--fall_contact_bodies")
    except ValueError:
        # arg file exists but carries no body list either — contact never
        # terminates
        return ()
    out = []
    for t in toks[i + 1:]:
        if t.startswith("--"):
            break
        out.append(int(t))
    return tuple(out)


def action_to_targets(action: jnp.ndarray) -> jnp.ndarray:
    """36-D DP-order PD action → (nhinge,) per-dof joint targets in MuJoCo
    qpos[7:] order: spherical axis-angle → quaternion → euler-rxyz hinge
    triple (the spherical joints are modelled as 3 hinges, as in the
    reference XML), revolute scalars pass through."""
    outs = []
    for j in BODY_JOINTS:
        off, n = _ACTION_SLICES[j]
        if n == 4:
            angle = action[off]
            axis = action[off + 1:off + 4]
            nrm = jnp.linalg.norm(axis)
            axis = jnp.where(nrm > 1e-9, axis / jnp.maximum(nrm, 1e-9),
                             jnp.asarray([1.0, 0.0, 0.0], action.dtype))
            q = jnp.concatenate(
                [jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis])
            outs.append(quat.euler_rxyz_from_quat(q))
        else:
            outs.append(action[off:off + 1])
    return jnp.concatenate(outs)


def targets_to_action(targets: np.ndarray) -> np.ndarray:
    """Inverse of :func:`action_to_targets` (host-side; for building
    reference/feed-forward actions from clip poses)."""
    action = np.zeros(ACTION_SIZE, np.float32)
    off_t = 0
    for j in BODY_JOINTS:
        off, n = _ACTION_SLICES[j]
        if n == 4:
            e = jnp.asarray(targets[off_t:off_t + 3])
            q = np.asarray(quat.quat_from_euler_rxyz(e))
            axis, angle = np.asarray(quat.to_axis_angle(jnp.asarray(q))[0]), \
                float(quat.to_axis_angle(jnp.asarray(q))[1])
            if np.linalg.norm(axis) < 1e-9:
                axis = np.array([1.0, 0.0, 0.0])
            action[off] = angle
            action[off + 1:off + 4] = axis
            off_t += 3
        else:
            action[off] = targets[off_t]
            off_t += 1
    return action


class DeepMimicSurfaceEnv:
    """Pure functional env over the original DeepMimic RL surface.

    obs = 197-D record_state; action = 36-D PD targets; reward = original
    imitation reward vs the mocap cursor; termination = fall contact (plus
    clip end for non-looping clips and an optional step cap)."""

    observation_size = STATE_SIZE
    action_size = ACTION_SIZE
    state_size = STATE_SIZE
    goal_size = 0

    def __init__(self, clip: str | MocapClip = "walk", model=None,
                 reward_mode: str = "imitation_dm", n_substeps: int = 2,
                 max_episode_steps: int = 300, write_phase: bool = True,
                 quirk_lateral: bool = False,
                 fall_contact_bodies: Optional[Sequence[int]] = None,
                 clip_velocities: str = "consistent"):
        self.model = model if model is not None else build_humanoid()
        clip_name = clip if isinstance(clip, str) else "walk"
        if not isinstance(clip, MocapClip):
            clip = load_clip(clip)
        self.clip = clip
        self.clip_len = len(clip)
        # 'consistent' = continuous pose track + integrator-consistent FD
        # velocities (MocapClip.qpos_cont/qvel_fd); 'reference' = the
        # verbatim conversion incl. the negated-ω velocity quirk
        consistent = clip_velocities == "consistent"
        self.clip_qpos = jnp.asarray(
            clip.qpos_cont if consistent else clip.qpos, jnp.float32)
        self.clip_qvel = jnp.asarray(
            clip.qvel_fd if consistent else clip.qvel, jnp.float32)
        self.clip_wraps = clip.loop == "wrap"
        if self.clip_wraps:
            off = np.asarray(clip.qpos[-1, 0:3] - clip.qpos[0, 0:3])
            off[2] = 0.0
        else:
            off = np.zeros(3)
        self.cycle_offset = jnp.asarray(off, jnp.float32)
        self.reward_mode = reward_mode
        self.n_substeps = n_substeps
        # frames advanced per control step (clips are 16-60 fps; see
        # DPEnvV3._clip_index)
        self.cursor_scale = float((max(n_substeps, 1) * self.model.dt)
                                  / clip.dt)
        self.max_episode_steps = max_episode_steps
        self.write_phase = write_phase
        self.quirk_lateral = quirk_lateral

        kp, kd = kp_kd_vectors()
        self._kp = jnp.asarray(kp, jnp.float32)
        self._kd = jnp.asarray(kd, jnp.float32)

        # BODY_DEFS → model body / geom indices (wrists are geoms on the
        # elbow bodies, deepmimic_api.py same mapping)
        bodydef_body, bodydef_geom, is_wrist = [], [], []
        for name in BODY_DEFS:
            w = name.endswith("wrist")
            is_wrist.append(w)
            bodydef_body.append(self.model.body_index(
                name.replace("wrist", "elbow") if w else name))
            bodydef_geom.append(self.model.geom_index(name))
        self._bodydef_body = np.asarray(bodydef_body, np.int32)
        self._bodydef_geom = np.asarray(bodydef_geom, np.int32)
        self._is_wrist = np.asarray(is_wrist)

        # fall-contact: mark floor-contact candidates on disallowed bodies
        if fall_contact_bodies is None:
            fall_contact_bodies = load_fall_contact_bodies(clip_name)
        self.fall_contact_bodies = tuple(fall_contact_bodies)
        disallowed = np.zeros(self.model.nbody, bool)
        for i in self.fall_contact_bodies:
            disallowed[self._bodydef_body[i]] = True
        self._fall_cand = jnp.asarray(
            disallowed[np.asarray(self.model.cand_body)])

        self._ee_geoms = np.asarray(
            [self.model.geom_index(n) for n in END_EFFECTORS], np.int32)
        if reward_mode == "imitation_dm":
            def frame_feats(qp, qv):
                kin = kinematics.fk(self.model, qp)
                ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
                com_vel = kinematics.com_velocity(self.model, kin, qv)
                return ee, com_vel

            ee, com_vel = jax.vmap(frame_feats)(self.clip_qpos, self.clip_qvel)
            self.clip_ee = ee
            self.clip_com_vel = com_vel

    # --- normalizer bootstrap builders (mujoco_env.py:149-182) ---
    def build_state_offset(self):
        return np.zeros(self.state_size)

    def build_state_scale(self):
        return np.ones(self.state_size)

    def build_state_norm_groups(self):
        tmp = np.zeros(self.state_size)
        tmp[-1] = 1
        return tmp

    def build_action_offset(self):
        return np.zeros(self.action_size)

    def build_action_scale(self):
        return np.ones(self.action_size)

    def build_action_bound_min(self):
        return -10 * np.ones(self.action_size)

    def build_action_bound_max(self):
        return 10 * np.ones(self.action_size)

    # ------------------------------------------------------------------
    def _clip_index(self, mocap_idx, init_idx=0):
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.cursor_scale)
        if self.clip_wraps:
            # cycles from the rounded position, so idx and the root
            # re-basing wrap together (see DPEnvV3._clip_index)
            idx_r = jnp.round(pos).astype(jnp.int32)
            return idx_r % self.clip_len, (
                idx_r // self.clip_len).astype(jnp.float32)
        return (jnp.minimum(jnp.round(pos).astype(jnp.int32),
                            self.clip_len - 1),
                jnp.zeros((), jnp.float32))

    def _clip_over(self, mocap_idx, init_idx):
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.cursor_scale)
        return pos >= self.clip_len - 1

    def record_state(self, qpos, qvel, mocap_idx, kin=None,
                     init_idx=0) -> jnp.ndarray:
        """The 197-D state (mujoco_env.py:91-124), pure JAX."""
        if kin is None:
            kin = kinematics.fk(self.model, qpos)
        geom_pos = kinematics.geom_world_pos(self.model, kin)
        omega, v_com, _, _ = dynamics.body_velocities(self.model, kin, qvel)

        xpos_body = kin.xpos[self._bodydef_body]
        xpos_geom = geom_pos[self._bodydef_geom]
        pos = jnp.where(self._is_wrist[:, None], xpos_geom, xpos_body)
        xquat = kin.xquat[self._bodydef_body]
        cvel = jnp.concatenate(
            [omega, v_com], axis=1)[self._bodydef_body]

        root = pos[0]
        idx, _ = self._clip_index(mocap_idx, init_idx)
        phase = (idx.astype(jnp.float32) / self.clip_len
                 if self.write_phase else jnp.zeros((), jnp.float32))
        coord = root[1] if self.quirk_lateral else root[2]
        body_block = jnp.concatenate(
            [pos - root, xquat], axis=1).reshape(-1)     # 15 × 7
        return jnp.concatenate(
            [jnp.stack([phase, coord]), body_block, cvel.reshape(-1)])

    def _state(self, qpos, qvel, key, init_idx, mocap_idx):
        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self.record_state(qpos, qvel, mocap_idx,
                                  init_idx=init_idx),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=mocap_idx, init_idx=init_idx,
            step_count=jnp.zeros((), jnp.int32), key=key,
        )

    def reset(self, key: jax.Array) -> EnvState:
        """Reference-state initialization over a random clip frame."""
        k_idx, key = jax.random.split(key)
        idx = jax.random.randint(k_idx, (), 0, self.clip_len)
        return self._state(self.clip_qpos[idx], self.clip_qvel[idx],
                           key, idx, idx)

    def reset_at(self, key: jax.Array, idx) -> EnvState:
        idx = jnp.asarray(idx, jnp.int32)
        return self._state(self.clip_qpos[idx], self.clip_qvel[idx],
                           key, idx, idx)

    def fall_contact(self, kin) -> jnp.ndarray:
        """True when any disallowed body touches the floor — the original
        fall termination (DeepMimic --fall_contact_bodies)."""
        contacts = collision.floor_contacts(self.model, kin)
        return jnp.any(contacts.active & self._fall_cand)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        targets = action_to_targets(action)
        qpos, qvel = engine.step_pd(
            self.model, state.qpos, state.qvel, targets, self._kp, self._kd,
            n_substeps=self.n_substeps)
        kin = kinematics.fk(self.model, qpos)

        done = self.fall_contact(kin)
        if self.max_episode_steps:
            done = done | (state.step_count + 1 >= self.max_episode_steps)

        mocap_idx = state.mocap_idx + 1
        idx, cycles = self._clip_index(mocap_idx, state.init_idx)
        if self.reward_mode == "imitation_dm":
            offset = cycles * self.cycle_offset
            ref_qp = self.clip_qpos[idx].at[0:3].add(offset)
            ref_qv = self.clip_qvel[idx]
            ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
            com_vel = kinematics.com_velocity(self.model, kin, qvel)
            reward = rewards.deepmimic_reward(
                qpos, qvel, ref_qp, ref_qv,
                ee_pos=ee, ref_ee_pos=self.clip_ee[idx] + offset,
                com_vel=com_vel, ref_com_vel=self.clip_com_vel[idx],
            )
        elif self.reward_mode == "alive":
            reward = jnp.ones((), jnp.float32)
        else:
            raise ValueError(f"unknown reward_mode {self.reward_mode!r}")
        if not self.clip_wraps:
            done = done | self._clip_over(mocap_idx, state.init_idx)

        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self.record_state(qpos, qvel, mocap_idx, kin,
                                  init_idx=state.init_idx),
            reward=reward, done=done,
            mocap_idx=mocap_idx, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key,
        )
