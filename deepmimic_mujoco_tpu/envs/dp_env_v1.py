"""DPEnv v1 — legacy weighted quaternion-reward env
(reference: /root/reference/src/dp_env_v1.py).

Semantics preserved:
* reward every ``update_interval = mocap_dt // sim_dt`` control steps, else 0
  (dp_env_v1.py:84-96); physics dt = 0.002, frame_skip 6
* pose error: JOINT_WEIGHT-weighted quaternion angles incl. the root
  (``MujocoInterface.calc_config_errs``, mujoco_interface.py:169-190)
* velocity error: Σ|mocap finite-diff vel − qvel[3:]| (dp_env_v1.py:104-115)
* root error: Σ|Δroot_xyz| (dp_env_v1.py:117-120)
* reward = 0.5·exp(−2·e_pose) + 0.05·exp(−0.1·e_vel) + 0.2·exp(−5·e_root)
  (dp_env_v1.py:130-139)
* velocity-consistent reset: qvel from finite difference to the next frame
  (dp_env_v1.py:171-183)
* termination on root height outside (0.7, 2.0)
* quirk preserved: ``calc_angular_vel_from_quaternion`` re-aligns the already
  Z-up-aligned quats (mocap_util.py:50-57), i.e. conjugates the difference by
  Rx(90°) — so the mocap angular velocities used for reset and the velocity
  error are rotated by (x, y, z) → (x, −z, y).  Scalar pose errors are
  invariant under this; the L1 velocity error is not, so we reproduce it.

Note: upstream v1 runs on a ball-joint MJCF (dp_env_v1.xml).  A ball joint
and an x,y,z hinge stack at the same anchor are kinematically identical; we
run on the hinge model and reconstruct joint quaternions from the hinge
triples.  Measured (tools/ball_vs_hinge_study.py, real MuJoCo 3.10 on the
reference XML vs an identically-parameterized hinge twin,
benchdata/ball_vs_hinge_v1.json): forward kinematics agree to < 5e-10 m on
every frame of all 15 clips, and under identical stable-PD clip tracking
the per-step v1 reward differs by mean 0.019 / max 0.058 per clip; the
ball joint's total-angle cone limits (inexpressible per-axis) contribute
at most 0.078 of that under tracking control.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.envs.types import EnvState
from deepmimic_mujoco_tpu.mocap.constants import BODY_JOINTS, DOF_DEF, JOINT_WEIGHT
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip
from deepmimic_mujoco_tpu.physics import build_humanoid, engine
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat

_SPH_OFF, _ONE_OFF, _SPH_W, _ONE_W = [], [], [], []
_off = 0
for _j in BODY_JOINTS:
    if DOF_DEF[_j] == 3:
        _SPH_OFF.append(_off)
        _SPH_W.append(JOINT_WEIGHT[_j])
        _off += 3
    else:
        _ONE_OFF.append(_off)
        _ONE_W.append(JOINT_WEIGHT[_j])
        _off += 1
_SPH_OFF = np.asarray(_SPH_OFF, np.int32)
_ONE_OFF = np.asarray(_ONE_OFF, np.int32)
_SPH_W = np.asarray(_SPH_W, np.float32)
_ONE_W = np.asarray(_ONE_W, np.float32)
_ROOT_W = float(JOINT_WEIGHT["root"])


class DPEnvV1:
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
        self.mocap_dt = float(clip.dt)
        # reward gating period (dp_env_v1.py:84): mocap_dt // control_dt
        self.update_interval = max(
            1, int(self.mocap_dt // (self.model.dt * n_substeps))
        )
        # velocity-consistent reset targets: finite difference to next frame
        qp = np.asarray(clip.qpos, np.float64)
        nxt = np.roll(qp, -1, axis=0)
        nxt[-1] = qp[-1]
        prv = qp.copy()
        prv[-1] = qp[-2]
        # root linear velocity
        root_vel = (nxt[:, :3] - prv[:, :3]) / self.mocap_dt

        # angular parts via quaternion differences on the euler-form qpos
        def ang_vel(e0, e1):
            q0 = quat.quat_from_euler_rxyz(e0)
            q1 = quat.quat_from_euler_rxyz(e1)
            return quat.angular_velocity(q0, q1, self.mocap_dt)

        def dbl(v):
            # reference double-alignment quirk: rotate by Rx(90°)
            v = np.asarray(v)
            return np.array([v[0], -v[2], v[1]])

        qvel_rows = []
        for k in range(len(clip)):
            a = prv[k]
            b = nxt[k]
            row = [root_vel[k]]
            row.append(dbl(quat.angular_velocity(
                jnp.asarray(a[3:7]), jnp.asarray(b[3:7]), self.mocap_dt)))
            off = 7
            for j in BODY_JOINTS:
                if DOF_DEF[j] == 3:
                    row.append(dbl(ang_vel(
                        jnp.asarray(a[off:off + 3]), jnp.asarray(b[off:off + 3]))))
                    off += 3
                else:
                    row.append([(b[off] - a[off]) / self.mocap_dt])
                    off += 1
            qvel_rows.append(np.concatenate(row))
        self._reset_qvel = jnp.asarray(np.stack(qvel_rows), jnp.float32)

    def _obs(self, qpos, qvel):
        return jnp.concatenate([qpos[2:], qvel])

    def reset(self, key: jax.Array) -> EnvState:
        k_idx, key = jax.random.split(key)
        idx = jax.random.randint(k_idx, (), 0, self.clip_len)
        qpos = self.clip_qpos[idx]
        qvel = self._reset_qvel[idx]
        return EnvState(
            qpos=qpos, qvel=qvel, obs=self._obs(qpos, qvel),
            reward=jnp.zeros((), jnp.float32), done=jnp.zeros((), bool),
            mocap_idx=jnp.zeros((), jnp.int32), init_idx=idx,
            step_count=jnp.zeros((), jnp.int32), key=key,
        )

    def _pose_error(self, qpos, ref_qpos):
        """Weighted quat-angle pose error INCLUDING root orientation."""
        err = _ROOT_W * jnp.abs(quat.angle_between(qpos[3:7], ref_qpos[3:7]))
        j, r = qpos[7:], ref_qpos[7:]
        e_sph = j[_SPH_OFF[:, None] + np.arange(3)[None, :]]
        r_sph = r[_SPH_OFF[:, None] + np.arange(3)[None, :]]
        ang = jnp.abs(quat.angle_between(
            quat.quat_from_euler_rxyz(e_sph), quat.quat_from_euler_rxyz(r_sph)))
        err += jnp.sum(_SPH_W * ang)
        err += jnp.sum(_ONE_W * jnp.abs(j[_ONE_OFF] - r[_ONE_OFF]))
        return err

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        qpos, qvel = engine.step(
            self.model, state.qpos, state.qvel, action, n_substeps=self.n_substeps
        )
        idx_curr = state.mocap_idx + 1
        idx_mocap = (idx_curr // self.update_interval + state.init_idx) % self.clip_len

        ref_qp = self.clip_qpos[idx_mocap]
        e_pose = self._pose_error(qpos, ref_qp)
        e_vel = jnp.sum(jnp.abs(self._reset_qvel[idx_mocap][3:] - qvel[3:]))
        e_root = jnp.sum(jnp.abs(qpos[:3] - ref_qp[:3]))
        reward_obs = (
            0.5 * jnp.exp(-2.0 * e_pose)
            + 0.05 * jnp.exp(-0.1 * e_vel)
            + 0.2 * jnp.exp(-5.0 * e_root)
        )
        gated = (idx_curr % self.update_interval) == 0
        reward_obs = jnp.where(gated, reward_obs, 0.0)
        reward = reward_obs - 0.1 * jnp.sum(jnp.square(action))
        done = (qpos[2] < 0.7) | (qpos[2] > 2.0)
        return EnvState(
            qpos=qpos, qvel=qvel, obs=self._obs(qpos, qvel),
            reward=reward, done=done,
            mocap_idx=idx_curr, init_idx=state.init_idx,
            step_count=state.step_count + 1, key=state.key,
        )
