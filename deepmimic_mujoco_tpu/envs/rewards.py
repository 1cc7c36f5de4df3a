"""DeepMimic imitation-reward machinery (pure JAX, batched-safe).

Implements the reward components the reference carries
(/root/reference/src/dp_env_v3.py:42-53 weights/scales;
/root/reference/src/mujoco/mujoco_interface.py:169-210 error functions;
/root/reference/src/env/deepmimic_env_mujoco.py:17-143 original C++ spec kept
as comments):

* pose error: JOINT_WEIGHT-weighted quaternion angles + weighted |Δq| for
  1-dof joints (``calc_config_errs``)
* velocity error: Σ|Δqvel| (``calc_vel_errs``)
* root error: Σ|Δroot_pos| (``calc_root_errs``)
* end-effector error: Σ|Δp| over wrists/ankles (original spec, TODO in ref)
* COM error: |Δcom| (original spec, TODO in ref)

Combined as Σ wᵢ·exp(-scaleᵢ·errᵢ) with the reference's stored weights
(0.5, 0.05, 0.2, 0.15, 0.1) and scales (2, 0.1, 5, 40, 10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from deepmimic_mujoco_tpu.mocap.constants import (
    BODY_JOINTS,
    DOF_DEF,
    JOINT_WEIGHT,
)
from deepmimic_mujoco_tpu.utils import quaternion as quat

# reference dp_env_v3.py:42-53
WEIGHT_POSE, WEIGHT_VEL, WEIGHT_ROOT = 0.5, 0.05, 0.2
WEIGHT_END_EFF, WEIGHT_COM = 0.15, 0.1
SCALE_POSE, SCALE_VEL, SCALE_ROOT = 2.0, 0.1, 5.0
SCALE_END_EFF, SCALE_COM = 40.0, 10.0
SCALE_ERR = 1.0

# hinge-triple slices into qpos[7:] per joint, in order
_SPH_SLICES = []
_ONE_SLICES = []
_off = 0
for _j in BODY_JOINTS:
    if DOF_DEF[_j] == 3:
        _SPH_SLICES.append((_j, _off))
        _off += 3
    else:
        _ONE_SLICES.append((_j, _off))
        _off += 1

_SPH_W = np.asarray([JOINT_WEIGHT[j] for j, _ in _SPH_SLICES], np.float32)
_ONE_W = np.asarray([JOINT_WEIGHT[j] for j, _ in _ONE_SLICES], np.float32)
_SPH_OFF = np.asarray([o for _, o in _SPH_SLICES], np.int32)
_ONE_OFF = np.asarray([o for _, o in _ONE_SLICES], np.int32)


def config_l1_error(joints: jnp.ndarray, ref_joints: jnp.ndarray) -> jnp.ndarray:
    """Σ|Δq| over qpos[7:] — v3 ``calc_config_errs``
    (/root/reference/src/dp_env_v3.py:85-87)."""
    return jnp.sum(jnp.abs(joints - ref_joints), axis=-1)


def weighted_pose_error(joints: jnp.ndarray, ref_joints: jnp.ndarray) -> jnp.ndarray:
    """JOINT_WEIGHT-weighted pose error: |quat angle| for spherical joints
    (reconstructed from the euler-rxyz hinge triples), weighted |Δq| for
    1-dof joints — ``MujocoInterface.calc_config_errs``
    (/root/reference/src/mujoco/mujoco_interface.py:169-190).  Root excluded
    (inputs are qpos[7:])."""
    e_sph = joints[..., _SPH_OFF[:, None] + np.arange(3)[None, :]]
    r_sph = ref_joints[..., _SPH_OFF[:, None] + np.arange(3)[None, :]]
    q_e = quat.quat_from_euler_rxyz(e_sph)
    q_r = quat.quat_from_euler_rxyz(r_sph)
    ang = jnp.abs(quat.angle_between(q_e, q_r))
    err = jnp.sum(_SPH_W * ang, axis=-1)
    d1 = jnp.abs(joints[..., _ONE_OFF] - ref_joints[..., _ONE_OFF])
    return err + jnp.sum(_ONE_W * d1, axis=-1)


def velocity_l1_error(qvel: jnp.ndarray, ref_qvel: jnp.ndarray) -> jnp.ndarray:
    """Σ|Δqvel| — ``calc_vel_errs`` (mujoco_interface.py:205-210)."""
    return jnp.sum(jnp.abs(qvel - ref_qvel), axis=-1)


def root_l1_error(root_pos: jnp.ndarray, ref_root_pos: jnp.ndarray) -> jnp.ndarray:
    """Σ|Δroot_pos| — ``calc_root_errs`` (mujoco_interface.py:192-199)."""
    return jnp.sum(jnp.abs(root_pos - ref_root_pos), axis=-1)


def end_effector_error(ee_pos: jnp.ndarray, ref_ee_pos: jnp.ndarray) -> jnp.ndarray:
    """Σ‖Δp‖ over the 4 end effectors (original DeepMimic spec; the
    reference leaves this TODO at dp_env_v1.py:122-124)."""
    return jnp.sum(jnp.linalg.norm(ee_pos - ref_ee_pos, axis=-1), axis=-1)


def com_error(com: jnp.ndarray, ref_com: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(com - ref_com, axis=-1)


_yaw_quat_inv = quat.heading_inverse


_W_ROOT = 1.0  # JOINT_WEIGHT["root"]


def deepmimic_reward(qpos, qvel, ref_qpos, ref_qvel,
                     ee_pos, ref_ee_pos, com_vel, ref_com_vel,
                     return_terms: bool = False) -> jnp.ndarray:
    """The ORIGINAL DeepMimic imitation reward, per the C++ spec the
    reference keeps as a comment (env/deepmimic_env_mujoco.py:17-143):

    * pose: Σ wⱼ·θⱼ²  (squared quaternion angles, root included)
    * velocity: Σ wⱼ·‖Δωⱼ‖²  (squared, root angular velocity included)
    * end-effector: mean over the 4 end effectors of the squared norm of the
      root-relative, heading-normalized position difference (height kept
      absolute — ground at z=0)
    * root: ‖Δpos‖² + 0.1·θ_root² + 0.01·‖Δv‖² + 0.001·‖Δω‖²
    * com: 0.1·‖Δcom_velocity‖²

    combined as Σ wᵢ·exp(−scaleᵢ·errᵢ) with weights .5/.05/.15/.2/.1 and
    scales 2/0.1/40/5/10.  Markedly softer than the port's L1 variant
    (``imitation_reward``) — good tracking scores ~0.8 instead of ~0.4.
    Heading-normalized/relative/velocity terms make every component
    invariant to the per-cycle root offset, so no re-basing is needed."""
    joints, ref_joints = qpos[7:], ref_qpos[7:]
    # pose (squared angles)
    e_sph = joints[_SPH_OFF[:, None] + np.arange(3)[None, :]]
    r_sph = ref_joints[_SPH_OFF[:, None] + np.arange(3)[None, :]]
    ang = quat.angle_between(quat.quat_from_euler_rxyz(e_sph),
                             quat.quat_from_euler_rxyz(r_sph))
    th_root = quat.angle_between(qpos[3:7], ref_qpos[3:7])
    d1 = joints[_ONE_OFF] - ref_joints[_ONE_OFF]
    pose_err = (_W_ROOT * th_root ** 2 + jnp.sum(_SPH_W * ang ** 2)
                + jnp.sum(_ONE_W * d1 ** 2))

    # velocity (squared, per joint)
    dv = qvel[6:] - ref_qvel[6:]
    dv_sph = dv[_SPH_OFF[:, None] + np.arange(3)[None, :]]
    d_root_w = qvel[3:6] - ref_qvel[3:6]
    vel_err = (_W_ROOT * jnp.sum(d_root_w ** 2)
               + jnp.sum(_SPH_W * jnp.sum(dv_sph ** 2, axis=-1))
               + jnp.sum(_ONE_W * dv[_ONE_OFF] ** 2))

    # end effectors: root-relative, heading-normalized, absolute height
    hq0 = _yaw_quat_inv(qpos[3:7])
    hq1 = _yaw_quat_inv(ref_qpos[3:7])
    rel0 = ee_pos - qpos[0:3]
    rel1 = ref_ee_pos - ref_qpos[0:3]
    rel0 = rel0.at[:, 2].set(ee_pos[:, 2])
    rel1 = rel1.at[:, 2].set(ref_ee_pos[:, 2])
    rel0 = jax.vmap(lambda v: quat.rotate(hq0, v))(rel0)
    rel1 = jax.vmap(lambda v: quat.rotate(hq1, v))(rel1)
    ee_err = jnp.mean(jnp.sum((rel1 - rel0) ** 2, axis=-1))

    # root
    root_err = (jnp.sum((qpos[0:3] - ref_qpos[0:3]) ** 2)
                + 0.1 * th_root ** 2
                + 0.01 * jnp.sum((qvel[0:3] - ref_qvel[0:3]) ** 2)
                + 0.001 * jnp.sum(d_root_w ** 2))

    com_err = 0.1 * jnp.sum((com_vel - ref_com_vel) ** 2)

    terms = {
        "pose": jnp.exp(-SCALE_ERR * SCALE_POSE * pose_err),
        "vel": jnp.exp(-SCALE_ERR * SCALE_VEL * vel_err),
        "ee": jnp.exp(-SCALE_ERR * SCALE_END_EFF * ee_err),
        "root": jnp.exp(-SCALE_ERR * SCALE_ROOT * root_err),
        "com": jnp.exp(-SCALE_ERR * SCALE_COM * com_err),
    }
    r = (WEIGHT_POSE * terms["pose"] + WEIGHT_VEL * terms["vel"]
         + WEIGHT_END_EFF * terms["ee"] + WEIGHT_ROOT * terms["root"]
         + WEIGHT_COM * terms["com"])
    if return_terms:
        return r, terms
    return r


def imitation_reward(
    joints, ref_joints, qvel, ref_qvel, root_pos, ref_root_pos,
    ee_pos=None, ref_ee_pos=None, com=None, ref_com=None,
) -> jnp.ndarray:
    """Full weighted imitation reward with the reference's weights/scales.

    ee/com terms are optional (the reference's v1 formula is pose+vel+root,
    dp_env_v1.py:138-139)."""
    r = WEIGHT_POSE * jnp.exp(-SCALE_ERR * SCALE_POSE * weighted_pose_error(joints, ref_joints))
    r += WEIGHT_VEL * jnp.exp(-SCALE_ERR * SCALE_VEL * velocity_l1_error(qvel, ref_qvel))
    r += WEIGHT_ROOT * jnp.exp(-SCALE_ERR * SCALE_ROOT * root_l1_error(root_pos, ref_root_pos))
    if ee_pos is not None:
        r += WEIGHT_END_EFF * jnp.exp(
            -SCALE_ERR * SCALE_END_EFF * end_effector_error(ee_pos, ref_ee_pos)
        )
    if com is not None:
        r += WEIGHT_COM * jnp.exp(-SCALE_ERR * SCALE_COM * com_error(com, ref_com))
    return r
