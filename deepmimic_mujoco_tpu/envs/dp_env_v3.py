"""DPEnv v3 — the canonical training environment, as a pure-functional
jit/vmap-able env (reference: /root/reference/src/dp_env_v3.py).

Semantics preserved exactly (incl. load-bearing quirks, SURVEY.md §7):

* obs = qpos[7:] ‖ qvel[6:] (56-D), root excluded (dp_env_v3.py:62-65)
* ``reset``: reference-state initialization — random mocap frame
  (dp_env_v3.py:67-71,148-156)
* ``reset_init``: ±0.01 uniform noise around the standing qpos0
  (dp_env_v3.py:158-163) — this is what training uses after every done
  (trpo.py:78-79)
* step: 1 physics substep per control step (dp_env_v3.py:108-112)
* reward: 1.0 alive bonus by default (dp_env_v3.py:117-128; imitation reward
  is present but commented out upstream — exposed here via ``reward_mode``)
* termination: whole-body CoM height outside (0.7, 2.0) (dp_env_v3.py:134-139)
* ``calc_config_reward`` advances the mocap cursor as a side effect
  (dp_env_v3.py:101-102) — reproduced in the "mocap" reward mode.

reward_mode:
  "alive"      1.0 per step (reference default — the standup/balance task)
  "mocap"      exp(-Σ|q-q̂|) vs the cursor frame, cursor advances
  "imitation"  full weighted DeepMimic reward (pose/vel/root/ee/com) with the
               reference's weights/scales — the commented-out capability
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.envs import rewards
from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.mocap.constants import END_EFFECTORS
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip
from deepmimic_mujoco_tpu.physics import build_humanoid, engine, kinematics
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat


def root_obs(qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Heading-invariant root features (11-D) for the 'full' obs mode:
    [root height (1), heading-normalized root quaternion (4, w≥0),
    heading-local root linear velocity (3), body-local root angular
    velocity (3)].  The same information the original DeepMimic
    ``record_state`` carries for the root (heading-normalized frame,
    mujoco/mujoco_env.py:91-124), without the per-body expansion."""
    q = qpos[3:7]
    q = jnp.where(q[0] < 0, -q, q)
    hq = quat.heading_inverse(q)
    q_local = quat.mul(hq, q)
    q_local = jnp.where(q_local[0] < 0, -q_local, q_local)
    v_local = quat.rotate(hq, qvel[0:3])
    # qvel[3:6] is already body-local angular velocity (free-joint layout)
    return jnp.concatenate([qpos[2:3], q_local, v_local, qvel[3:6]])


class DPEnvV3:
    """Functional environment. All methods are pure and safe under
    jit/vmap/scan; per-env state lives in :class:`EnvState`."""

    # gym-API metadata
    observation_size = 56
    action_size = 28

    def __init__(
        self,
        clip: str | MocapClip = "walk",
        model: Optional[PhysicsModel] = None,
        reward_mode: str = "alive",
        n_substeps: int = 1,
        reset_noise: float = 0.01,
        dynamics: str = "jax",
        control_mode: str = "torque",
        include_phase: Optional[bool] = None,
        max_episode_steps: int = 0,
        obs_mode: Optional[str] = None,
        termination: Optional[str] = None,
        pd_target_interp: bool = True,
        clip_velocities: str = "consistent",
    ):
        """``control_mode``: 'torque' (reference v3 — actions are motor ctrl
        through gear/ctrlrange) or 'pd' (DeepMimic-proper — actions are joint
        target angles tracked by a per-substage PD controller,
        engine.step_pd).  ``include_phase``: prepend the normalized mocap
        phase to the observation (defaults on for the imitation reward, which
        is time-indexed and unlearnable without it).  ``max_episode_steps``:
        0 = reference behaviour (no cap); >0 adds a time-limit done.

        ``obs_mode``: 'legacy' = the reference's qpos[7:] ‖ qvel[6:] 56-D obs
        (dp_env_v3.py:62-65 — a quirk that hides the root entirely: fine for
        the standup task, fatal for imitation, where the policy must sense
        tipping); 'full' = DeepMimic-style root-aware obs prepending
        [root height, heading-normalized root quat, heading-local root linear
        velocity, body-local root angular velocity] (11-D) to the legacy
        core, matching the information content of the original 197-D
        ``record_state`` (mujoco/mujoco_env.py:91-124) in compact form.
        Defaults to 'full' for the imitation reward modes, 'legacy'
        otherwise.

        ``termination``: 'com' = the reference's whole-body CoM height
        bounds (0.7, 2.0) (dp_env_v3.py:134-139 — a standup-task rule:
        spinkick's crouch passes 0.75 and backflip/cartwheel legitimately
        dip BELOW 0.7, so it kills valid acrobatic tracking);
        'fall_contact' = the original DeepMimic rule — episode ends when a
        non-allowed body touches the floor (--fall_contact_bodies in every
        arg file).  Defaults to 'fall_contact' for the imitation reward
        modes, 'com' otherwise."""
        self.model = model if model is not None else build_humanoid()
        self.control_mode = control_mode
        # pd_residual + imitation: step the PD feed-forward target along the
        # clip once per SUBSTEP instead of holding one pose per control step
        # (see step(); measured ceiling lift in tools/tracking_ceiling_probe
        # — the reference's host loop writes one torque per control step,
        # mujoco_interface.py:97-107, losing 60 fps clips at 30 Hz control)
        self.pd_target_interp = pd_target_interp
        if include_phase is None:
            include_phase = reward_mode in ("imitation", "imitation_dm")
        self.include_phase = include_phase
        if obs_mode is None:
            obs_mode = ("full" if reward_mode in ("imitation", "imitation_dm")
                        else "legacy")
        if obs_mode not in ("legacy", "full"):
            raise ValueError(f"unknown obs_mode {obs_mode!r}")
        self.obs_mode = obs_mode
        core = 56 + (11 if obs_mode == "full" else 0)
        self.observation_size = core + (1 if include_phase else 0)
        if termination is None:
            termination = ("fall_contact"
                           if reward_mode in ("imitation", "imitation_dm")
                           else "com")
        if termination not in ("com", "fall_contact"):
            raise ValueError(f"unknown termination {termination!r}")
        self.termination = termination
        if termination == "fall_contact":
            from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
                load_fall_contact_bodies,
            )
            from deepmimic_mujoco_tpu.mocap.constants import BODY_DEFS

            clip_name = clip if isinstance(clip, str) else "walk"
            disallowed = np.zeros(self.model.nbody, bool)
            for i in load_fall_contact_bodies(clip_name):
                name = BODY_DEFS[i]
                disallowed[self.model.body_index(
                    name.replace("wrist", "elbow")
                    if name.endswith("wrist") else name)] = True
            self._fall_cand = jnp.asarray(
                disallowed[np.asarray(self.model.cand_body)])
        self.max_episode_steps = max_episode_steps
        if control_mode in ("pd", "pd_residual"):
            from deepmimic_mujoco_tpu.mocap.constants import kp_kd_vectors

            kp, kd = kp_kd_vectors()
            self._kp = jnp.asarray(kp, jnp.float32)
            self._kd = jnp.asarray(kd, jnp.float32)
        elif control_mode != "torque":
            raise ValueError(f"unknown control_mode {control_mode!r}")
        if dynamics == "jax":
            if control_mode in ("pd", "pd_residual"):
                # 'pd': action = absolute joint targets.  'pd_residual':
                # action = offset from the clip pose at the mocap cursor, so
                # a zero action tracks the reference feed-forward and the
                # policy learns balance corrections only.
                self._dynamics = lambda qp, qv, ac: engine.step_pd(
                    self.model, qp, qv, ac, self._kp, self._kd,
                    n_substeps=self.n_substeps)
            else:
                self._dynamics = lambda qp, qv, ac: engine.step(
                    self.model, qp, qv, ac, n_substeps=self.n_substeps)
        elif dynamics == "mujoco":
            # golden-physics A/B backend (host callback, CPU only)
            assert control_mode == "torque", \
                "mujoco backend supports torque control only"
            from deepmimic_mujoco_tpu.physics.mj_host import MJHostDynamics

            mj = MJHostDynamics(self.model)
            self._dynamics = lambda qp, qv, ac: mj.step(
                qp, qv, ac, n_substeps=n_substeps)
        else:
            raise ValueError(f"unknown dynamics backend {dynamics!r}")
        if not isinstance(clip, MocapClip):
            clip = load_clip(clip)
        self.clip = clip
        self.clip_len = len(clip)
        # 'consistent' (default): integrator-consistent FD velocities
        # (MocapClip.qvel_fd) — what RSI resets and velocity-reward targets
        # should be.  'reference': the reference's negated-ω quirk arrays
        # (mocap_v2.py:64-76,113) for behavioural parity studies.
        if clip_velocities not in ("consistent", "reference"):
            raise ValueError(f"unknown clip_velocities {clip_velocities!r}")
        self.clip_velocities = clip_velocities
        # frames advanced per control step (clips are 16-60 fps; control
        # runs at n_substeps·dt) — see _clip_index
        self.cursor_scale = float((max(n_substeps, 1) * self.model.dt)
                                  / clip.dt)
        consistent = clip_velocities == "consistent"
        self.clip_qpos = jnp.asarray(
            clip.qpos_cont if consistent else clip.qpos, jnp.float32)
        self.clip_qvel = jnp.asarray(
            clip.qvel_fd if consistent else clip.qvel, jnp.float32)
        self.reward_mode = reward_mode
        self.n_substeps = n_substeps
        self.reset_noise = reset_noise

        self._ee_geoms = np.asarray(
            [self.model.geom_index(n) for n in END_EFFECTORS], np.int32
        )
        # cyclic-clip handling (used by the phase obs, pd_residual targets
        # and the imitation reward): looping clips wrap the cursor and
        # re-base the root each pass; non-looping clips clamp at the last
        # frame and the imitation episode ends when the motion is over
        self.clip_wraps = clip.loop == "wrap"
        if self.clip_wraps:
            off = np.asarray(clip.qpos[-1, 0:3] - clip.qpos[0, 0:3])
            off[2] = 0.0
        else:
            off = np.zeros(3)
        self.cycle_offset = jnp.asarray(off, jnp.float32)
        if reward_mode in ("imitation", "imitation_dm"):
            # precompute reference end-effector / COM tracks via batched FK
            def frame_feats(qp, qv):
                kin = kinematics.fk(self.model, qp)
                ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
                com = kinematics.mass_center(self.model, kin)
                com_vel = kinematics.com_velocity(self.model, kin, qv)
                return ee, com, com_vel

            ee, com, com_vel = jax.vmap(frame_feats)(
                self.clip_qpos, self.clip_qvel)
            self.clip_ee = ee            # (T, 4, 3)
            self.clip_com = com          # (T, 3)
            self.clip_com_vel = com_vel  # (T, 3)

    # ------------------------------------------------------------------
    def _clip_index(self, mocap_idx, init_idx=0):
        """(frame index, completed cycles) for an unbounded cursor: looping
        clips wrap (per-cycle root re-basing — reference mocap_v2.play
        phase_offset, mocap_v2.py:168-182); non-looping clips clamp at the
        final frame.

        The cursor counts CONTROL steps since the episode started at frame
        ``init_idx``; clips are not all 30 fps (walk/run 30, spinkick/
        cartwheel/dance 60, backflip 16, spin 24), so the frame position is
        init + elapsed·(control_dt / clip_dt).  Advancing one frame per
        control step — the reference's habit (dp_env_v3.py:101-102) — plays
        a 60 fps clip at half speed with velocity targets 2× inconsistent
        with the pose targets."""
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.cursor_scale)
        if self.clip_wraps:
            # cycles must come from the SAME rounded position as idx:
            # when pos ∈ [T-0.5, T) the index wraps to 0, and the root
            # re-basing has to wrap with it or the reward sees a spurious
            # one-cycle root error once per cycle
            idx_r = jnp.round(pos).astype(jnp.int32)
            idx = idx_r % self.clip_len
            return idx, (idx_r // self.clip_len).astype(jnp.float32)
        idx = jnp.minimum(jnp.round(pos).astype(jnp.int32),
                          self.clip_len - 1)
        return idx, jnp.zeros((), jnp.float32)

    def _clip_over(self, mocap_idx, init_idx):
        """Non-looping clips: the motion ends when the frame position
        reaches the final frame."""
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.cursor_scale)
        return pos >= self.clip_len - 1

    def _obs(self, qpos, qvel, mocap_idx, init_idx=0):
        core = jnp.concatenate([qpos[7:], qvel[6:]])
        if self.obs_mode == "full":
            core = jnp.concatenate([root_obs(qpos, qvel), core])
        if not self.include_phase:
            return core
        idx, _ = self._clip_index(mocap_idx, init_idx)
        phase = idx.astype(jnp.float32) / self.clip_len
        return jnp.concatenate([phase[None], core])

    def _state(self, qpos, qvel, key, init_idx, mocap_idx):
        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self._obs(qpos, qvel, mocap_idx, init_idx),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=mocap_idx, init_idx=init_idx,
            step_count=jnp.zeros((), jnp.int32), key=key,
        )

    def reset(self, key: jax.Array) -> EnvState:
        """Reference-state initialization: start from a random mocap frame
        (``reset_model``, dp_env_v3.py:148-156)."""
        k_idx, key = jax.random.split(key)
        idx = jax.random.randint(k_idx, (), 0, self.clip_len)
        return self._state(self.clip_qpos[idx], self.clip_qvel[idx], key, idx, idx)

    def reset_at(self, key: jax.Array, idx) -> EnvState:
        """Deterministic reset to a specific mocap frame."""
        idx = jnp.asarray(idx, jnp.int32)
        return self._state(self.clip_qpos[idx], self.clip_qvel[idx], key, idx, idx)

    def reset_init(self, key: jax.Array) -> EnvState:
        """Noise reset around the standing pose (``reset_model_init``,
        dp_env_v3.py:158-163) — used after every done during training."""
        k1, k2, key = jax.random.split(key, 3)
        c = self.reset_noise
        qpos = self.model.qpos0 + jax.random.uniform(
            k1, (self.model.nq,), minval=-c, maxval=c)
        qvel = jax.random.uniform(
            k2, (self.model.nv,), minval=-c, maxval=c)
        zero = jnp.zeros((), jnp.int32)
        return self._state(qpos, qvel, key, zero, zero)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        if self.control_mode == "pd_residual":
            # target the frame the character should REACH by the end of this
            # control step (the advanced cursor) — targeting the current
            # frame leaves a permanent one-frame lag in the feed-forward
            imit = self.reward_mode in ("imitation", "imitation_dm")
            if imit and self.pd_target_interp and self.n_substeps > 1:
                # per-substep feed-forward: target the clip pose each
                # SUBSTEP should reach, not one pose held across the whole
                # control period.  Holding one target for a 33 ms control
                # step loses fast clips — spinkick (60 fps) one-step
                # tracking reward 0.476 held vs 0.741 stepped
                # (tools/tracking_ceiling_probe.py) — because the reference
                # pose moves 2 frames per control step (cursor_scale=2).
                # The policy residual (one per control step, the DeepMimic
                # query rate) rides on top of every substep's target.
                fracs = jnp.arange(
                    1, self.n_substeps + 1, dtype=jnp.float32
                ) / self.n_substeps
                idx_s, _ = jax.vmap(
                    lambda f: self._clip_index(
                        state.mocap_idx + f, state.init_idx))(fracs)
                action = self.clip_qpos[idx_s][:, 7:] + action
            else:
                ref_idx, _ = self._clip_index(
                    state.mocap_idx + (1 if imit else 0), state.init_idx)
                action = self.clip_qpos[ref_idx][7:] + action
        qpos, qvel = self._dynamics(state.qpos, state.qvel, action)
        kin = kinematics.fk(self.model, qpos)
        com = kinematics.mass_center(self.model, kin)
        if self.termination == "fall_contact":
            from deepmimic_mujoco_tpu.physics import collision

            contacts = collision.floor_contacts(self.model, kin)
            done = jnp.any(contacts.active & self._fall_cand)
        else:
            done = (com[2] < 0.7) | (com[2] > 2.0)
        if self.max_episode_steps:
            done = done | (state.step_count + 1 >= self.max_episode_steps)

        mocap_idx = state.mocap_idx
        if self.reward_mode == "alive":
            reward = jnp.ones((), jnp.float32)
        elif self.reward_mode == "mocap":
            ref = self.clip_qpos[mocap_idx % self.clip_len]
            err = rewards.config_l1_error(qpos[7:], ref[7:])
            reward = jnp.exp(-err)
            mocap_idx = (mocap_idx + 1) % self.clip_len
        elif self.reward_mode == "imitation":
            # the cursor advances FIRST: the post-step pose is compared with
            # the post-step clip frame.  (Comparing against the pre-advance
            # frame — the convention of the reference's commented-out reward,
            # dp_env_v3.py:101-102, preserved in the 'mocap' mode above —
            # penalizes a perfect tracker by one frame and makes the pose and
            # velocity targets mutually inconsistent.)
            mocap_idx = mocap_idx + 1
            idx, cycles = self._clip_index(mocap_idx, state.init_idx)
            offset = cycles * self.cycle_offset  # root re-basing per cycle
            ref_qp = self.clip_qpos[idx]
            ref_qv = self.clip_qvel[idx]
            ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
            reward = rewards.imitation_reward(
                qpos[7:], ref_qp[7:], qvel, ref_qv,
                qpos[0:3], ref_qp[0:3] + offset,
                ee_pos=ee, ref_ee_pos=self.clip_ee[idx] + offset,
                com=com, ref_com=self.clip_com[idx] + offset,
            )
            if not self.clip_wraps:
                # the motion is over → episode ends (original DeepMimic ends
                # non-looping imitation episodes at the clip end)
                done = done | self._clip_over(mocap_idx, state.init_idx)
        elif self.reward_mode == "imitation_dm":
            # the ORIGINAL DeepMimic reward (rewards.deepmimic_reward):
            # squared errors, heading-normalized relative end effectors,
            # com-velocity term — every component invariant to the per-cycle
            # root x-y offset except root position, which is re-based.
            # Cursor advances first (see the 'imitation' branch).
            mocap_idx = mocap_idx + 1
            idx, cycles = self._clip_index(mocap_idx, state.init_idx)
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
            if not self.clip_wraps:
                done = done | self._clip_over(mocap_idx, state.init_idx)
        else:
            raise ValueError(f"unknown reward_mode {self.reward_mode!r}")

        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self._obs(qpos, qvel, mocap_idx, state.init_idx),
            reward=reward, done=done,
            mocap_idx=mocap_idx, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key,
        )
