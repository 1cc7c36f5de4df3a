"""Batched quaternion / rotation algebra for TPU (JAX).

Conventions
-----------
* Quaternions are ``(..., 4)`` arrays in **wxyz** order (MuJoCo / pyquaternion
  convention).  The reference mixes wxyz (pyquaternion) with xyzw (old Gohlke
  ``transformations.py``, see ``/root/reference/src/mujoco/mocap_v2.py:136-138``);
  this library is wxyz-only and provides explicit conversions where the
  reference's xyzw behaviour must be reproduced.
* All functions broadcast over arbitrary leading batch dimensions and are
  jit/vmap/grad-safe (no data-dependent Python control flow).

Reference parity targets (cited per function):
* ``pyquaternion.Quaternion`` algebra used by
  ``/root/reference/src/mujoco/mocap_v2.py:64-76`` (calc_rot_vel) and
  ``/root/reference/src/mujoco/mocap_util.py:50-77``.
* Gohlke ``euler_from_quaternion(..., axes='rxyz')`` used by
  ``/root/reference/src/mujoco/mocap_v2.py:136-139``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jax.Array) -> jax.Array:
    """Return the unit quaternion along ``q`` (safe at ~zero norm)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def mul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product ``q ⊗ r`` (wxyz)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def conj(q: jax.Array) -> jax.Array:
    """Quaternion conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` (..., 3) by unit quaternion(s) ``q`` (..., 4).

    Computes ``R(q) @ v`` without forming the matrix:
    v' = v + 2*w*(u×v) + 2*u×(u×v).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate ``v`` by the inverse of ``q`` (i.e. ``R(q)^T @ v``)."""
    return rotate(conj(q), v)


def to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) → rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_mat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4), w ≥ 0.

    Branch-free Shepperd method via jnp.where (jit-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best one.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s_w = _safe_sqrt(1.0 + tr) * 2.0  # 4w
    q_w = jnp.stack([0.25 * s_w, (m21 - m12) / s_w, (m02 - m20) / s_w, (m10 - m01) / s_w], axis=-1)
    s_x = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # 4x
    q_x = jnp.stack([(m21 - m12) / s_x, 0.25 * s_x, (m01 + m10) / s_x, (m02 + m20) / s_x], axis=-1)
    s_y = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0  # 4y
    q_y = jnp.stack([(m02 - m20) / s_y, (m01 + m10) / s_y, 0.25 * s_y, (m12 + m21) / s_y], axis=-1)
    s_z = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0  # 4z
    q_z = jnp.stack([(m10 - m01) / s_z, (m02 + m20) / s_z, (m12 + m21) / s_z, 0.25 * s_z], axis=-1)

    cond_w = tr > 0.0
    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    q = jnp.where(
        cond_w[..., None],
        q_w,
        jnp.where(cond_x[..., None], q_x, jnp.where(cond_y[..., None], q_y, q_z)),
    )
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return normalize(q)


def heading_inverse(q: jax.Array) -> jax.Array:
    """Quaternion rotating by −yaw(q) about z — DeepMimic's
    ``BuildOriginTrans`` heading normalization (Z-up here vs its Y-up;
    original spec kept at /root/reference/src/env/deepmimic_env_mujoco.py:
    17-143).  Composing ``mul(heading_inverse(q), q)`` yields the root
    orientation with its heading removed."""
    siny = 2.0 * (q[..., 0] * q[..., 3] + q[..., 1] * q[..., 2])
    cosy = 1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2)
    half = -0.5 * jnp.arctan2(siny, cosy)
    zero = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)], axis=-1)


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis (..., 3) + angle (...) → quaternion (..., 4)."""
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def to_axis_angle(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quaternion → (axis (...,3), angle (...)), pyquaternion semantics.

    angle = wrap(2*atan2(|v|, w)) ∈ (-π, π]; axis = v/|v| (zeros when |v|≈0).
    Matches ``pyquaternion.Quaternion.angle/.axis`` as used by
    ``mocap_v2.calc_rot_vel`` (/root/reference/src/mujoco/mocap_v2.py:64-76).
    """
    q = normalize(q)
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, q[..., 0])  # ∈ [0, 2π)
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    axis = v / jnp.maximum(n, _EPS)[..., None]
    axis = jnp.where(n[..., None] > 1e-9, axis, jnp.zeros_like(axis))
    return axis, angle


def log_map(q: jax.Array) -> jax.Array:
    """Rotation-vector (axis*angle) log map, angle wrapped to (-π, π]."""
    axis, angle = to_axis_angle(q)
    return axis * angle[..., None]


def exp_map(w: jax.Array) -> jax.Array:
    """Rotation-vector (..., 3) → quaternion; inverse of :func:`log_map`."""
    angle = jnp.linalg.norm(w, axis=-1)
    axis = w / jnp.maximum(angle, _EPS)[..., None]
    q = from_axis_angle(axis, angle)
    return jnp.where(angle[..., None] > 1e-9, q, jnp.concatenate(
        [jnp.ones_like(angle)[..., None], 0.5 * w], axis=-1))


def angular_velocity(q0: jax.Array, q1: jax.Array, dt) -> jax.Array:
    """Angular velocity taking ``q0`` → ``q1`` over ``dt``.

    Reproduces ``MocapDM.calc_rot_vel``
    (/root/reference/src/mujoco/mocap_v2.py:64-76): body-frame difference
    ``q0* ⊗ q1``, axis-angle over dt.  NOTE the reference computes the velocity
    *into the past* when called with (curr, prev) — we preserve call order.
    """
    d = mul(conj(q0), q1)
    axis, angle = to_axis_angle(d)
    return (angle / dt)[..., None] * axis


def angle_between(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """Wrapped rotation angle of ``q0* ⊗ q1`` — pyquaternion ``.angle`` of the
    difference, as in ``mocap_util.calc_diff_from_quaternion``
    (/root/reference/src/mujoco/mocap_util.py:67-77)."""
    d = mul(conj(q0), q1)
    _, angle = to_axis_angle(d)
    return angle


def integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by *local-frame* angular velocity ``omega``
    over ``dt`` (MuJoCo ``mju_quatIntegrate`` semantics: q ← q ⊗ exp(ω dt/2))."""
    return normalize(mul(q, exp_map(omega * dt)))


def integrate_world(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate by *world-frame* angular velocity: q ← exp(ω dt/2) ⊗ q."""
    return normalize(mul(exp_map(omega * dt), q))


# --------------------------------------------------------------------------
# Euler conversions — intrinsic x-y-z ("rxyz" in Gohlke's transformations.py).
# The MuJoCo humanoid decomposes every spherical joint into an x,y,z hinge
# stack, and the mocap pipeline stores those hinge angles as euler 'rxyz'
# (/root/reference/src/mujoco/mocap_v2.py:136-139).
# --------------------------------------------------------------------------

def euler_rxyz_from_quat(q: jax.Array) -> jax.Array:
    """Quaternion (wxyz) → intrinsic-xyz euler angles (..., 3).

    Equivalent to the reference's
    ``euler_from_quaternion([x,y,z,w], axes='rxyz')``
    (/root/reference/src/transformations.py:1089 with the wxyz→xyzw shuffle at
    mocap_v2.py:137).  R = Rx(a)·Ry(b)·Rz(c);
    b = asin(R02), a = atan2(-R12, R22), c = atan2(-R01, R00).
    """
    m = to_mat(normalize(q))
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m12, m22 = m[..., 1, 2], m[..., 2, 2]
    m10, m11 = m[..., 1, 0], m[..., 1, 1]
    cy = jnp.sqrt(m00 * m00 + m01 * m01)  # |cos(b)|
    # Regular branch
    a = jnp.arctan2(-m12, m22)
    b = jnp.arctan2(m02, cy)
    c = jnp.arctan2(-m01, m00)
    # Gimbal-lock branch (|cos b| ~ 0): Gohlke folds the residual angle into
    # the *last* axis for 'rxyz' (frame=1 swaps ai/ak): a = 0,
    # c = atan2(m10, m11).  Verified numerically against the reference.
    a_g = jnp.zeros_like(a)
    c_g = jnp.arctan2(m10, m11)
    gimbal = cy < 1e-8
    return jnp.stack(
        [jnp.where(gimbal, a_g, a), b, jnp.where(gimbal, c_g, c)], axis=-1
    )


def quat_from_euler_rxyz(e: jax.Array) -> jax.Array:
    """Intrinsic-xyz euler angles (..., 3) → quaternion (wxyz).

    q = qx(a) ⊗ qy(b) ⊗ qz(c); inverse of :func:`euler_rxyz_from_quat` and of
    the humanoid's stacked x,y,z hinge composition."""
    ha, hb, hc = 0.5 * e[..., 0], 0.5 * e[..., 1], 0.5 * e[..., 2]
    ca, sa = jnp.cos(ha), jnp.sin(ha)
    cb, sb = jnp.cos(hb), jnp.sin(hb)
    cc, sc = jnp.cos(hc), jnp.sin(hc)
    return jnp.stack(
        [
            ca * cb * cc - sa * sb * sc,
            sa * cb * cc + ca * sb * sc,
            ca * sb * cc - sa * cb * sc,
            ca * cb * sc + sa * sb * cc,
        ],
        axis=-1,
    )
