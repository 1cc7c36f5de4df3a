"""Floor-plane collision with static candidate sets.

TPU-first design: instead of MuJoCo's dynamic broadphase/narrowphase, every
geom contributes a *fixed* set of candidate contact points vs. the floor
plane (sphere center, capsule endpoints, box corners), precomputed at model
build.  Each step evaluates all candidates and masks inactive ones — static
shapes, no data-dependent control flow, fully vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics.kinematics import Kin, point_jacobian
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat

# geoms activate contacts within this distance (reference XML geom default
# margin="0.001", dp_env_v3.xml:5)
MARGIN = 1e-3


class Contacts(NamedTuple):
    pos: jnp.ndarray     # (ncand,) signed distance - margin (<0 ⇒ active)
    active: jnp.ndarray  # (ncand,) bool
    jac: jnp.ndarray     # (ncand, 3, nv) rows: [normal(z); tangent x; tangent y]
    mu: jnp.ndarray      # (ncand,)


def floor_contacts(model: PhysicsModel, kin: Kin) -> Contacts:
    b = model.cand_body
    p_w = kin.xpos[b] + quat.rotate(kin.xquat[b], model.cand_pos)  # (ncand, 3)
    dist = p_w[:, 2] - model.cand_radius  # surface height above plane
    pos = dist - MARGIN
    active = pos < 0.0

    # contact point on the surface (directly below candidate center/corner)
    cpoint = p_w - jnp.stack(
        [jnp.zeros_like(dist), jnp.zeros_like(dist), model.cand_radius], axis=-1
    )
    jp = point_jacobian(model, kin, b, cpoint)  # (ncand, 3, nv)
    # constraint rows: normal (world z) first, then the two tangents (x, y)
    jac = jp[:, jnp.array([2, 0, 1]), :]
    # jnp so downstream tracer-indexing works when model is a closure constant
    return Contacts(pos=pos, active=active, jac=jac, mu=jnp.asarray(model.cand_mu))


class Limits(NamedTuple):
    pos: jnp.ndarray     # (nh,) signed distance to nearest violated bound (<0 ⇒ active)
    active: jnp.ndarray  # (nh,) bool
    sign: jnp.ndarray    # (nh,) +1 lower bound, -1 upper bound


def joint_limits(model: PhysicsModel, qpos: jnp.ndarray) -> Limits:
    q = qpos[7:]
    lo, hi = model.hinge_range[:, 0], model.hinge_range[:, 1]
    d_lo = q - lo
    d_hi = hi - q
    lower_worse = d_lo < d_hi
    dist = jnp.where(lower_worse, d_lo, d_hi)
    sign = jnp.where(lower_worse, 1.0, -1.0)
    active = (dist < 0.0) & model.hinge_limited
    # unlimited hinges report a neutral depth so the solver's deepest-first
    # top-k can never rank them above a genuinely violated limit row
    dist = jnp.where(model.hinge_limited, dist, 0.0)
    return Limits(pos=dist, active=active, sign=sign)
