"""Forward kinematics (single sample; batch via vmap).

Replaces MuJoCo's ``mj_kinematics``/``mj_comPos`` for the supported tree
(free root + stacked hinges anchored at body origins).  Stacked hinges
compose intrinsically, so an x,y,z hinge triple reproduces the euler-'rxyz'
decomposition the mocap pipeline emits (mocap_v2.py:136-139).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat


class Kin(NamedTuple):
    """World-frame kinematic quantities for one configuration."""

    xpos: jnp.ndarray       # (nbody, 3) body frame origins
    xquat: jnp.ndarray      # (nbody, 4) body orientations
    xcom: jnp.ndarray       # (nbody, 3) body COM positions (MuJoCo xipos)
    rot_axes: jnp.ndarray   # (nv, 3) world axis per rotational dof (0 for trans)
    trans_axes: jnp.ndarray  # (nv, 3) world axis per translational dof
    anchors: jnp.ndarray    # (nv, 3) world anchor per rotational dof


def fk(model: PhysicsModel, qpos: jnp.ndarray) -> Kin:
    nb, nv = model.nbody, model.nv
    root_q = quat.normalize(qpos[3:7])

    xpos = [qpos[0:3]]
    xquat = [root_q]
    hinge_axis_w = [None] * model.nhinge
    for i in range(1, nb):
        p = int(model.parent[i])
        pos = xpos[p] + quat.rotate(xquat[p], model.body_pos[i])
        q = quat.mul(xquat[p], model.body_quat[i])
        for j in model.body_hinges[i]:
            axis_w = quat.rotate(q, model.hinge_axis[j])
            hinge_axis_w[j] = axis_w
            q = quat.mul(q, quat.from_axis_angle(model.hinge_axis[j], qpos[7 + j]))
        xpos.append(pos)
        xquat.append(q)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xcom = xpos + quat.rotate(xquat, model.body_com)

    # dof axes/anchors
    eye3 = jnp.eye(3, dtype=qpos.dtype)
    root_R = quat.to_mat(root_q)  # local axes as columns
    rot_axes = jnp.concatenate(
        [jnp.zeros((3, 3), qpos.dtype), root_R.T] + [a[None] for a in hinge_axis_w]
    )
    trans_axes = jnp.concatenate([eye3, jnp.zeros((nv - 3, 3), qpos.dtype)])
    anchors = jnp.concatenate(
        [
            jnp.zeros((3, 3), qpos.dtype),
            jnp.broadcast_to(xpos[0], (3, 3)),
            xpos[model.hinge_body],
        ]
    )
    return Kin(xpos, xquat, xcom, rot_axes, trans_axes, anchors)


def com_jacobians(model: PhysicsModel, kin: Kin) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense COM Jacobians: J_lin, J_ang of shape (nbody, 3, nv).

    Column d of J_ang[i] is the world rotation axis of dof d (if it moves
    body i); column d of J_lin[i] is axis_d x (com_i - anchor_d) for
    rotational dofs plus e_d for the root translation dofs.  Dense/batched on
    purpose: downstream mass-matrix/bias assembly becomes large einsums that
    map well onto the TPU MXU (vs. MuJoCo's sequential sparse CRBA).
    """
    mask = model.ancestor_mask  # (nbody, nv)
    # (nbody, nv, 3)
    arm = kin.xcom[:, None, :] - kin.anchors[None, :, :]
    lin = jnp.cross(kin.rot_axes[None, :, :], arm) + kin.trans_axes[None, :, :]
    ang = jnp.broadcast_to(kin.rot_axes[None], (model.nbody, model.nv, 3))
    j_lin = (mask[:, :, None] * lin).swapaxes(-1, -2)  # (nbody, 3, nv)
    j_ang = (mask[:, :, None] * ang).swapaxes(-1, -2)
    return j_lin, j_ang


def point_jacobian(model: PhysicsModel, kin: Kin, body: jnp.ndarray,
                   point: jnp.ndarray) -> jnp.ndarray:
    """Jacobian (..., 3, nv) of world point(s) attached to body(ies).

    ``body``: (...,) int32; ``point``: (..., 3) world coordinates.
    """
    mask = model.ancestor_mask[body]  # (..., nv)
    arm = point[..., None, :] - kin.anchors  # (..., nv, 3)
    lin = jnp.cross(kin.rot_axes, arm) + kin.trans_axes
    return (mask[..., None] * lin).swapaxes(-1, -2)


def geom_world_pos(model: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """World positions of all geoms (ngeom, 3)."""
    b = model.geom_body
    return kin.xpos[b] + quat.rotate(kin.xquat[b], model.geom_pos)


def mass_center(model: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Whole-body COM (3,) — reference ``mass_center``/``is_done`` input
    (/root/reference/src/dp_env_v3.py:29-32,134-139)."""
    m = model.body_mass
    return jnp.sum(m[:, None] * kin.xcom, axis=0) / jnp.sum(m)


def com_velocity(model: PhysicsModel, kin: Kin, qvel: jnp.ndarray
                 ) -> jnp.ndarray:
    """Whole-body COM velocity (3,) = Σmᵢ·(J_lin,i q̇)/M — the ``CalcCOMVel``
    input of the original DeepMimic reward's com term."""
    j_lin, _ = com_jacobians(model, kin)          # (nbody, 3, nv)
    v = jnp.einsum("bij,j->bi", j_lin, qvel)      # (nbody, 3)
    m = model.body_mass
    return jnp.sum(m[:, None] * v, axis=0) / jnp.sum(m)
