"""Multi-skill imitation environment: one policy, many mocap clips.

Beyond the reference (which selects exactly one skill per training run via
``Config.motion``, config.py:4-18): clips are stacked into padded device
arrays and each episode imitates the clip named by ``state.clip_id``, with a
one-hot skill code + phase in the observation.  Everything stays static-shape
and vmap-safe, so a single jitted TRPO/PPO program trains all skills at once
(the "multi-skill imitation" target in BASELINE.json).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.envs import rewards
from deepmimic_mujoco_tpu.envs.dp_env_v3 import root_obs
from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.mocap.constants import END_EFFECTORS
from deepmimic_mujoco_tpu.mocap.loader import load_clip
from deepmimic_mujoco_tpu.physics import build_humanoid, engine, kinematics


class DPEnvV3Multi:
    """Skill-conditioned imitation env (imitation reward, PD-residual or PD
    control).  obs = [one_hot(K) ‖ phase ‖ root_obs(11) ‖ qpos[7:] ‖
    qvel[6:]] — root-aware by default (see DPEnvV3 ``obs_mode='full'``)."""

    action_size = 28

    def __init__(self, clips: Sequence[str] = ("walk", "run", "spinkick"),
                 model=None, control_mode: str = "pd_residual",
                 n_substeps: int = 2,
                 max_episode_steps: int = 300,
                 reward_mode: str = "imitation_dm",
                 obs_mode: str = "full",
                 clip_weights: Optional[Sequence[float]] = None,
                 termination: str = "fall_contact",
                 clip_velocities: str = "consistent",
                 pd_target_interp: bool = True):
        """``clip_weights``: RSI skill-sampling probabilities (uniform when
        None) — up-weight hard skills so they aren't starved by easy ones in
        the shared batch.  ``termination``: 'fall_contact' (original
        DeepMimic rule, default — the reference's CoM bound kills valid
        acrobatic clips, see DPEnvV3) or 'com'."""
        self.model = model if model is not None else build_humanoid()
        self.clip_names = list(clips)
        loaded = [load_clip(c) for c in clips]
        K = len(loaded)
        tmax = max(len(c) for c in loaded)
        nq, nv = self.model.nq, self.model.nv

        qpos = np.zeros((K, tmax, nq), np.float32)
        qvel = np.zeros((K, tmax, nv), np.float32)
        lens = np.zeros(K, np.int32)
        wraps = np.zeros(K, bool)
        cyc_off = np.zeros((K, 3), np.float32)
        for k, c in enumerate(loaded):
            T = len(c)
            lens[k] = T
            # 'consistent' = continuous pose track + integrator-consistent
            # FD velocities (MocapClip.qpos_cont/qvel_fd — the reference's
            # arrays carry euler branch flips and a negated-ω velocity
            # quirk that poison PD feed-forwards/RSI states on fast clips)
            consistent = clip_velocities == "consistent"
            cp = c.qpos_cont if consistent else c.qpos
            cv = c.qvel_fd if consistent else c.qvel
            qpos[k, :T] = cp
            qvel[k, :T] = cv
            # pad with the final frame so clamped indexing is trivial
            qpos[k, T:] = cp[-1]
            qvel[k, T:] = cv[-1]
            wraps[k] = c.loop == "wrap"
            if wraps[k]:
                off = np.asarray(c.qpos[-1, 0:3] - c.qpos[0, 0:3])
                off[2] = 0.0
                cyc_off[k] = off
        self.num_clips = K
        # frames advanced per control step per clip (clips are 16-60 fps)
        control_dt = max(n_substeps, 1) * self.model.dt
        self.clip_scales = jnp.asarray(
            [control_dt / c.dt for c in loaded], jnp.float32)
        self.clip_qpos = jnp.asarray(qpos)
        self.clip_qvel = jnp.asarray(qvel)
        self.clip_lens = jnp.asarray(lens)
        self.clip_wraps = jnp.asarray(wraps)
        self.cycle_offset = jnp.asarray(cyc_off)
        self.n_substeps = n_substeps
        self.max_episode_steps = max_episode_steps
        self.control_mode = control_mode
        # per-substep PD feed-forward (see DPEnvV3.step: holding one clip
        # target across a 33 ms control step loses 60 fps clips — measured
        # spinkick one-step tracking 0.476 held vs 0.741 stepped)
        self.pd_target_interp = pd_target_interp
        if obs_mode not in ("legacy", "full"):
            raise ValueError(f"unknown obs_mode {obs_mode!r}")
        self.obs_mode = obs_mode
        self.observation_size = (K + 1 + (11 if obs_mode == "full" else 0)
                                 + (nq - 7) + (nv - 6))
        if clip_weights is None:
            w = np.full(K, 1.0 / K, np.float32)
        else:
            w = np.asarray(clip_weights, np.float32)
            assert w.shape == (K,) and (w >= 0).all() and w.sum() > 0
            w = w / w.sum()
        self.clip_weights = jnp.asarray(w)
        assert termination in ("com", "fall_contact")
        self.termination = termination
        if termination == "fall_contact":
            from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
                load_fall_contact_bodies,
            )
            from deepmimic_mujoco_tpu.mocap.constants import BODY_DEFS

            # per-clip lists: the arg files differ per skill upstream
            # (e.g. getup/roll motions allow extra contact bodies) — using
            # clips[0]'s rule for every skill would terminate valid episodes
            cand = np.asarray(self.model.cand_body)
            fall_cand = np.zeros((K, len(cand)), bool)
            for k_i, cname in enumerate(self.clip_names):
                disallowed = np.zeros(self.model.nbody, bool)
                for i in load_fall_contact_bodies(cname):
                    name = BODY_DEFS[i]
                    disallowed[self.model.body_index(
                        name.replace("wrist", "elbow")
                        if name.endswith("wrist") else name)] = True
                fall_cand[k_i] = disallowed[cand]
            self._fall_cand = jnp.asarray(fall_cand)  # (K, n_cand)

        from deepmimic_mujoco_tpu.mocap.constants import kp_kd_vectors

        kp, kd = kp_kd_vectors()
        self._kp = jnp.asarray(kp, jnp.float32)
        self._kd = jnp.asarray(kd, jnp.float32)
        assert control_mode in ("pd", "pd_residual")
        assert reward_mode in ("imitation", "imitation_dm")
        self.reward_mode = reward_mode

        self._ee_geoms = np.asarray(
            [self.model.geom_index(n) for n in END_EFFECTORS], np.int32)

        def frame_feats(qp, qv):
            kin = kinematics.fk(self.model, qp)
            ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
            com = kinematics.mass_center(self.model, kin)
            com_vel = kinematics.com_velocity(self.model, kin, qv)
            return ee, com, com_vel

        ee, com, com_vel = jax.vmap(jax.vmap(frame_feats))(
            self.clip_qpos, self.clip_qvel)
        self.clip_ee = ee            # (K, Tmax, 4, 3)
        self.clip_com = com          # (K, Tmax, 3)
        self.clip_com_vel = com_vel  # (K, Tmax, 3)

    # ------------------------------------------------------------------
    def _clip_index(self, clip_id, mocap_idx, init_idx=0):
        """Frame position = init + elapsed·(control_dt/clip_dt) — clips are
        not all 30 fps (see DPEnvV3._clip_index)."""
        T = self.clip_lens[clip_id]
        wraps = self.clip_wraps[clip_id]
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.clip_scales[clip_id])
        idx_r = jnp.round(pos).astype(jnp.int32)
        idx = jnp.where(wraps, idx_r % T, jnp.minimum(idx_r, T - 1))
        # cycles from the rounded position, so idx and the root re-basing
        # wrap together (see DPEnvV3._clip_index)
        cycles = jnp.where(wraps, (idx_r // T).astype(jnp.float32), 0.0)
        return idx, cycles

    def _clip_over(self, clip_id, mocap_idx, init_idx):
        pos = (jnp.asarray(init_idx, jnp.float32)
               + (mocap_idx - init_idx) * self.clip_scales[clip_id])
        return pos >= self.clip_lens[clip_id] - 1

    def _obs(self, qpos, qvel, clip_id, mocap_idx, init_idx=0):
        idx, _ = self._clip_index(clip_id, mocap_idx, init_idx)
        phase = idx.astype(jnp.float32) / self.clip_lens[clip_id]
        onehot = jax.nn.one_hot(clip_id, self.num_clips)
        parts = [onehot, phase[None]]
        if self.obs_mode == "full":
            parts.append(root_obs(qpos, qvel))
        parts += [qpos[7:], qvel[6:]]
        return jnp.concatenate(parts)

    def _state(self, qpos, qvel, key, clip_id, idx):
        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self._obs(qpos, qvel, clip_id, idx, idx),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=idx, init_idx=idx,
            step_count=jnp.zeros((), jnp.int32), key=key, clip_id=clip_id,
        )

    def reset(self, key: jax.Array) -> EnvState:
        """RSI over a random (clip, frame); skills drawn by clip_weights."""
        k_c, k_i, key = jax.random.split(key, 3)
        clip_id = jax.random.choice(k_c, self.num_clips, (),
                                    p=self.clip_weights)
        idx = jax.random.randint(
            k_i, (), 0, 1 << 30) % self.clip_lens[clip_id]
        return self._state(self.clip_qpos[clip_id, idx],
                           self.clip_qvel[clip_id, idx], key, clip_id, idx)

    def reset_at(self, key: jax.Array, clip_id, idx) -> EnvState:
        clip_id = jnp.asarray(clip_id, jnp.int32)
        idx = jnp.asarray(idx, jnp.int32)
        return self._state(self.clip_qpos[clip_id, idx],
                           self.clip_qvel[clip_id, idx], key, clip_id, idx)

    def reset_keep_clip(self, key: jax.Array, state: EnvState) -> EnvState:
        """RSI over a random frame of the SAME clip the episode was running
        (``reset_mode='rsi_pinned'``): lanes of independent per-skill
        learners vmapped over one shared compiled program each keep their
        own skill (tools/imitation15_vmapped.py) instead of resampling by
        ``clip_weights``."""
        k_i, key = jax.random.split(key)
        clip_id = state.clip_id
        idx = jax.random.randint(
            k_i, (), 0, 1 << 30) % self.clip_lens[clip_id]
        return self._state(self.clip_qpos[clip_id, idx],
                           self.clip_qvel[clip_id, idx], key, clip_id, idx)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        clip_id = state.clip_id
        # cursor advances first; PD feed-forward and reward both reference
        # the frame the character should reach by the END of this control
        # step (see DPEnvV3.step for rationale)
        mocap_idx = state.mocap_idx + 1
        ref_idx, _ = self._clip_index(clip_id, mocap_idx, state.init_idx)
        if self.control_mode == "pd_residual":
            if self.pd_target_interp and self.n_substeps > 1:
                # per-substep feed-forward: each substep targets the clip
                # pose it should reach (DPEnvV3.step rationale); the policy
                # residual (one per control step) rides on every target
                fracs = jnp.arange(
                    1, self.n_substeps + 1, dtype=jnp.float32
                ) / self.n_substeps
                idx_s, _ = jax.vmap(
                    lambda f: self._clip_index(
                        clip_id, state.mocap_idx + f, state.init_idx))(fracs)
                action = self.clip_qpos[clip_id, idx_s][:, 7:] + action
            else:
                action = self.clip_qpos[clip_id, ref_idx][7:] + action
        qpos, qvel = engine.step_pd(
            self.model, state.qpos, state.qvel, action, self._kp, self._kd,
            n_substeps=self.n_substeps)

        kin = kinematics.fk(self.model, qpos)
        com = kinematics.mass_center(self.model, kin)
        if self.termination == "fall_contact":
            from deepmimic_mujoco_tpu.physics import collision

            contacts = collision.floor_contacts(self.model, kin)
            done = jnp.any(contacts.active & self._fall_cand[clip_id])
        else:
            done = (com[2] < 0.7) | (com[2] > 2.0)
        if self.max_episode_steps:
            done = done | (state.step_count + 1 >= self.max_episode_steps)

        idx, cycles = self._clip_index(clip_id, mocap_idx, state.init_idx)
        offset = cycles * self.cycle_offset[clip_id]
        ref_qp = self.clip_qpos[clip_id, idx]
        ref_qv = self.clip_qvel[clip_id, idx]
        ee = kinematics.geom_world_pos(self.model, kin)[self._ee_geoms]
        if self.reward_mode == "imitation_dm":
            com_vel = kinematics.com_velocity(self.model, kin, qvel)
            reward = rewards.deepmimic_reward(
                qpos, qvel, ref_qp.at[0:3].add(offset), ref_qv,
                ee_pos=ee, ref_ee_pos=self.clip_ee[clip_id, idx] + offset,
                com_vel=com_vel, ref_com_vel=self.clip_com_vel[clip_id, idx],
            )
        else:
            reward = rewards.imitation_reward(
                qpos[7:], ref_qp[7:], qvel, ref_qv,
                qpos[0:3], ref_qp[0:3] + offset,
                ee_pos=ee, ref_ee_pos=self.clip_ee[clip_id, idx] + offset,
                com=com, ref_com=self.clip_com[clip_id, idx] + offset,
            )
        # non-looping clips: episode ends when the motion is over
        done = done | (~self.clip_wraps[clip_id]
                       & self._clip_over(clip_id, mocap_idx, state.init_idx))

        return EnvState(
            qpos=qpos, qvel=qvel,
            obs=self._obs(qpos, qvel, clip_id, mocap_idx, state.init_idx),
            reward=reward, done=done,
            mocap_idx=mocap_idx, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key, clip_id=clip_id,
        )
