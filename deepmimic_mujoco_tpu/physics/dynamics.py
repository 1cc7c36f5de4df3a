"""Smooth (unconstrained) dynamics: mass matrix, bias forces, actuation.

Dense-Jacobian formulation replacing MuJoCo's CRBA/RNE
(``mj_crb``/``mj_rne``): with per-body COM Jacobians J, the joint-space mass
matrix is M = Σ_i mᵢ Jlinᵢᵀ Jlinᵢ + Jangᵢᵀ Iᵢʷ Jangᵢ and the bias force is
the J-projection of each body's velocity-product + gravity wrench.  Batched
over envs these assemble as large einsums (MXU) instead of sequential tree
recursions.

Convention: free-joint linear velocity is world-frame, angular velocity is
**body-local** (verified against MuJoCo's integrator behaviour).
"""

from __future__ import annotations

import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics.kinematics import Kin, com_jacobians
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat


def world_inertia(model: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Per-body inertia about COM in world axes: R I Rᵀ, (nbody, 3, 3)."""
    R = quat.to_mat(kin.xquat)
    return jnp.einsum("nab,nbc,ndc->nad", R, model.body_inertia, R)


def mass_matrix(model: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Joint-space mass matrix (nv, nv) incl. armature."""
    j_lin, j_ang = com_jacobians(model, kin)
    iw = world_inertia(model, kin)
    m = jnp.einsum("n,nav,naw->vw", model.body_mass, j_lin, j_lin)
    m = m + jnp.einsum("nav,nab,nbw->vw", j_ang, iw, j_ang)
    arma = jnp.zeros(model.nv, m.dtype).at[6:].set(model.armature)
    return m + jnp.diag(arma)


def body_velocities(model: PhysicsModel, kin: Kin, qvel: jnp.ndarray):
    """Propagate velocities and (q̈=0) bias accelerations down the tree.

    Returns (omega, vel_com, domega_bias, acc_com_bias), each (nbody, 3),
    world frame.  Equivalent to the velocity passes of RNE with zero joint
    acceleration.
    """
    root_R = quat.to_mat(kin.xquat[0])
    omega = [root_R @ qvel[3:6]]  # local → world
    dom_b = [jnp.zeros(3, qvel.dtype)]
    v_o = [qvel[0:3]]       # body-origin linear velocity
    a_ob = [jnp.zeros(3, qvel.dtype)]

    for i in range(1, model.nbody):
        p = int(model.parent[i])
        r = kin.xpos[i] - kin.xpos[p]
        v = v_o[p] + jnp.cross(omega[p], r)
        a = a_ob[p] + jnp.cross(dom_b[p], r) + jnp.cross(
            omega[p], jnp.cross(omega[p], r)
        )
        w = omega[p]
        dw = dom_b[p]
        for j in model.body_hinges[i]:
            axis_w = kin.rot_axes[6 + j]
            qd = qvel[6 + j]
            dw = dw + jnp.cross(w, axis_w) * qd
            w = w + axis_w * qd
        omega.append(w)
        dom_b.append(dw)
        v_o.append(v)
        a_ob.append(a)

    omega = jnp.stack(omega)
    dom_b = jnp.stack(dom_b)
    v_o = jnp.stack(v_o)
    a_ob = jnp.stack(a_ob)

    rc = kin.xcom - kin.xpos
    v_com = v_o + jnp.cross(omega, rc)
    a_com_b = a_ob + jnp.cross(dom_b, rc) + jnp.cross(omega, jnp.cross(omega, rc))
    return omega, v_com, dom_b, a_com_b


def bias_force(model: PhysicsModel, kin: Kin, qvel: jnp.ndarray,
               jac: tuple | None = None) -> jnp.ndarray:
    """qfrc_bias (nv,): Coriolis + centrifugal + gravity (MuJoCo mj_rne).

    ``jac``: optional precomputed ``(j_lin, j_ang, iw)`` — these depend on
    ``kin`` only, so a caller evaluating several velocities at one frozen
    configuration (engine stage_reuse='kin') computes them once."""
    if jac is not None:
        j_lin, j_ang, iw = jac
    else:
        j_lin, j_ang = com_jacobians(model, kin)
        iw = world_inertia(model, kin)
    omega, _, dom_b, a_com_b = body_velocities(model, kin, qvel)
    f = model.body_mass[:, None] * (a_com_b - model.gravity)
    tau = jnp.einsum("nab,nb->na", iw, dom_b) + jnp.cross(
        omega, jnp.einsum("nab,nb->na", iw, omega)
    )
    return jnp.einsum("nav,na->v", j_lin, f) + jnp.einsum("nav,na->v", j_ang, tau)


def passive_force(model: PhysicsModel, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_passive: joint damping on hinge dofs (XML default damping=1)."""
    return jnp.zeros(model.nv, qvel.dtype).at[6:].set(-model.damping * qvel[6:])


def actuator_force(model: PhysicsModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    """qfrc_actuator: torque motors τ = gear · clip(ctrl, ctrlrange)
    (/root/reference/src/mujoco/humanoid_deepmimic/envs/asset/dp_env_v3.xml:7,121-156)."""
    c = jnp.clip(ctrl, model.ctrl_range[:, 0], model.ctrl_range[:, 1])
    out = jnp.zeros(model.nv, ctrl.dtype)
    return out.at[6 + model.actuator_hinge].add(model.actuator_gear * c)
