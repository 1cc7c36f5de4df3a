"""Simulation engine: forward dynamics + integrators.

``step(model, qpos, qvel, ctrl)`` is a pure function of one env's state —
the TPU-native replacement for ``MjSim.step`` (mujoco_py C engine, used per
step at /root/reference/src/dp_env_v3.py:112).  Batch thousands of envs with
``jax.vmap(step, (None, 0, 0, 0))`` and scan over time.

Integrators: ``rk4`` (classic 4-stage, matching the reference XML's
``integrator="RK4"``) and ``euler`` (semi-implicit, MuJoCo-style implicit
joint damping).  Quaternion positions integrate on the manifold via the
exponential map (MuJoCo ``mj_integratePos`` semantics, body-local ω).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics import collision, dynamics, kinematics, solver
from deepmimic_mujoco_tpu.physics.model import PhysicsModel
from deepmimic_mujoco_tpu.utils import quaternion as quat


class Forward(NamedTuple):
    qacc: jnp.ndarray
    kin: kinematics.Kin
    contact_force: jnp.ndarray  # (ncand*3 + nh,) constraint forces


_NS_ITERS_LO = 8   # TPU-default (bf16) precision phase
_NS_ITERS_HI = 2   # f32 clean-up phase


def mass_inverse(m: jnp.ndarray, lo_iters: int = _NS_ITERS_LO,
                 hi_iters: int = _NS_ITERS_HI) -> jnp.ndarray:
    """Explicit M⁻¹ via Jacobi-scaled Newton–Schulz iteration — pure batched
    matmuls, so it runs on the MXU instead of the sequential batched Cholesky
    XLA emits for small SPD factorizations (3-4× faster per step on v5e,
    residual ‖M⁻¹M−I‖∞ ≈ 2e-6).

    D^{-1/2}MD^{-1/2} has κ≈10 for the humanoid (κ(M)≈110), so with
    X₀ = I/‖B‖₁ the quadratic iteration X ← X(2I−BX) converges fast.
    Mixed precision: the first ``lo_iters`` run at TPU-default (bf16) matmul
    precision down to the bf16 floor (~1e-2); quadratic convergence then
    squares the residual twice through the two f32 iterations
    (1e-2 → 1e-4 → 1e-8, i.e. the f32 floor) at a fraction of the cost of
    running every pass at ``precision='highest'`` (4.6 vs 7.1 ms at B=4096).

    Negative result (r3, do not retry): warm-starting NS from the previous
    integrator stage's M⁻¹ (the trick that works for the APGD dual solve,
    PhysicsModel.warm_iterations) DIVERGES here — measured ‖I − X₀M_new‖∞
    crosses 1 already at ~0.03-0.05 rad of uniform joint-angle change, well
    inside one dt·q̇ stage delta for fast clips, and NS blows up outside
    that radius.  The Jacobi-scaled cold start is the safe path."""
    hi = jax.lax.Precision.HIGHEST
    dinv = 1.0 / jnp.sqrt(jnp.diagonal(m, axis1=-2, axis2=-1))
    b = m * dinv[..., None, :] * dinv[..., :, None]
    norm1 = jnp.max(jnp.sum(jnp.abs(b), axis=-1), axis=-1)
    nv = m.shape[-1]
    x = jnp.eye(nv, dtype=m.dtype) / norm1[..., None, None]
    eye2 = 2.0 * jnp.eye(nv, dtype=m.dtype)

    def body_lo(x, _):
        return jnp.matmul(x, eye2 - jnp.matmul(b, x)), None

    def body_hi(x, _):
        return jnp.matmul(x, eye2 - jnp.matmul(b, x, precision=hi),
                          precision=hi), None

    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    x, _ = jax.lax.scan(body_lo, x, None, length=lo_iters,
                        unroll=unroll_for("ns", lo_iters))
    x, _ = jax.lax.scan(body_hi, x, None, length=hi_iters,
                        unroll=unroll_for("ns", hi_iters))
    return x * dinv[..., None, :] * dinv[..., :, None]


def _chol_inv_mul(m: jnp.ndarray, mode: str = "ns"):
    """Return x ↦ M⁻¹x.  ``mode`` 'ns' uses the Newton–Schulz explicit
    inverse (MXU-friendly, iteration budget tuned for the humanoid's
    conditioning); 'cholesky' the unconditionally robust XLA solve —
    selected per model via :func:`calibrate_minv_mode` so an imported MJCF
    with a stiffer mass matrix cannot silently simulate inaccurate
    dynamics."""
    hi = jax.lax.Precision.HIGHEST
    if mode == "cholesky":
        chol = jax.scipy.linalg.cho_factor(m)

        def m_inv_mul(x):
            return jax.scipy.linalg.cho_solve(chol, x)

        return m_inv_mul
    minv = mass_inverse(m)

    def m_inv_mul(x):
        return jnp.matmul(minv, x, precision=hi)

    return m_inv_mul


def ns_inverse_residual(model: PhysicsModel, qpos: jnp.ndarray) -> jnp.ndarray:
    """‖M⁻¹M − I‖∞ of the Newton–Schulz inverse at a configuration."""
    from deepmimic_mujoco_tpu.physics import dynamics, kinematics

    kin = kinematics.fk(model, qpos)
    m = dynamics.mass_matrix(model, kin)
    minv = mass_inverse(m)
    hi = jax.lax.Precision.HIGHEST
    r = jnp.matmul(minv, m, precision=hi) - jnp.eye(model.nv, dtype=m.dtype)
    return jnp.max(jnp.abs(r))


def calibrate_minv_mode(model: PhysicsModel, n_samples: int = 8,
                        tol: float = 1e-4, seed: int = 0) -> PhysicsModel:
    """Measure the NS inverse residual at qpos0 plus random perturbations and
    pick the M⁻¹ path: 'ns' when the fixed iteration budget converges below
    ``tol`` everywhere, 'cholesky' otherwise.  Run once at model build (the
    MJCF importer does) — never on the step path."""
    import dataclasses

    key = jax.random.PRNGKey(seed)
    worst = 0.0
    for i in range(n_samples):
        key, k = jax.random.split(key)
        qpos = model.qpos0
        if i > 0:
            dq = 0.3 * jax.random.normal(k, (model.nq,))
            qpos = qpos + dq
            # keep the root quaternion unit
            qpos = qpos.at[3:7].set(quat.normalize(qpos[3:7]))
        worst = max(worst, float(ns_inverse_residual(model, qpos)))
    mode = "ns" if worst < tol else "cholesky"
    return dataclasses.replace(model, minv_mode=mode)


def forward(model: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
            ctrl: jnp.ndarray, extra_damping: float = 0.0,
            qfrc_applied: jnp.ndarray | None = None,
            f_warm: jnp.ndarray | None = None,
            solver_iterations: int | None = None) -> Forward:
    """Forward dynamics: qacc given (qpos, qvel, ctrl).

    ``extra_damping`` adds dt·damping to the hinge diagonal of M (used by the
    semi-implicit Euler integrator, MuJoCo mj_Euler behaviour).
    ``qfrc_applied`` adds a generalized force (nv,) directly — the MuJoCo
    ``qfrc_applied`` channel, used by the PD controller path.
    ``f_warm``/``solver_iterations`` warm-start the constraint solve from a
    previous stage's forces with a reduced budget (see
    PhysicsModel.warm_iterations).
    """
    kin = kinematics.fk(model, qpos)
    m = dynamics.mass_matrix(model, kin)
    if extra_damping:
        diag = jnp.zeros(model.nv, m.dtype).at[6:].set(extra_damping * model.damping)
        m = m + jnp.diag(diag)
    bias = dynamics.bias_force(model, kin, qvel)
    tau = (
        dynamics.actuator_force(model, ctrl)
        + dynamics.passive_force(model, qvel)
        - bias
    )
    if qfrc_applied is not None:
        tau = tau + qfrc_applied
    m_inv_mul = _chol_inv_mul(m, getattr(model, "minv_mode", "ns"))
    qacc_smooth = m_inv_mul(tau)

    contacts = collision.floor_contacts(model, kin)
    limits = collision.joint_limits(model, qpos)
    sol = solver.solve_constraints(model, m_inv_mul, qacc_smooth, qvel,
                                   contacts, limits, f_warm=f_warm,
                                   iterations=solver_iterations)
    qacc = qacc_smooth + m_inv_mul(sol.qfrc_constraint)
    return Forward(qacc=qacc, kin=kin, contact_force=sol.force)


def _nefc_full(model: PhysicsModel) -> int:
    """Length of the full-candidate constraint-force vector."""
    return int(model.ncand) * 3 + int(model.nhinge)


def integrate_pos(model: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
                  dt) -> jnp.ndarray:
    """qpos ⊞ qvel·dt: linear for translations/hinges, exponential map for the
    root quaternion (body-local angular velocity)."""
    root_pos = qpos[0:3] + dt * qvel[0:3]
    root_quat = quat.integrate(qpos[3:7], qvel[3:6], dt)
    hinges = qpos[7:] + dt * qvel[6:]
    return jnp.concatenate([root_pos, root_quat, hinges])


def _euler_substep(model: PhysicsModel, qpos, qvel, fwd, f_warm):
    """Semi-implicit Euler with implicit joint damping (MuJoCo mj_Euler).
    ``fwd(qp, qv, extra_damping, f_warm) → Forward`` supplies the dynamics.
    Returns (qpos, qvel, contact_force) — the force warm-starts the next
    substep's solve."""
    dt = model.dt
    f = fwd(qpos, qvel, dt, f_warm)
    qvel_new = qvel + dt * f.qacc
    qpos_new = integrate_pos(model, qpos, qvel_new, dt)
    return qpos_new, qvel_new, f.contact_force


def _rk4_substep(model: PhysicsModel, qpos, qvel, fwd, f_warm):
    """Classic RK4 on (qpos, qvel) with manifold-aware qpos updates
    (MuJoCo mj_RungeKutta semantics, reference XML integrator).

    The four stages run as a ``lax.scan`` over the Butcher coefficients so
    the forward-dynamics graph is traced/compiled once instead of four times
    — a ~4× cut in XLA compile time for every program containing a step.
    Constraint forces thread through the stage carry: with
    ``model.warm_iterations`` set, each stage warm-starts its solve from the
    previous stage's forces (f_warm enters as the stage-1 start)."""
    dt = model.dt
    a_coefs = jnp.asarray([0.0, 0.5, 0.5, 1.0], qvel.dtype)
    b_coefs = jnp.asarray([1.0, 2.0, 2.0, 1.0], qvel.dtype) / 6.0

    def stage(carry, coefs):
        a_i, b_i = coefs
        kv_prev, ka_prev, acc_v, acc_a, f_prev = carry
        qp_i = integrate_pos(model, qpos, kv_prev, dt * a_i)
        qv_i = qvel + dt * a_i * ka_prev
        kv = qv_i
        out = fwd(qp_i, qv_i, 0.0, f_prev)
        ka = out.qacc
        return (kv, ka, acc_v + b_i * kv, acc_a + b_i * ka,
                out.contact_force), None

    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    zeros_v = jnp.zeros_like(qvel)
    carry0 = (zeros_v, zeros_v, zeros_v, zeros_v, f_warm)
    (_, _, v_avg, a_avg, f_last), _ = jax.lax.scan(
        stage, carry0, (a_coefs, b_coefs), unroll=unroll_for("stages", 4))
    qpos_new = integrate_pos(model, qpos, v_avg, dt)
    qvel_new = qvel + dt * a_avg
    return qpos_new, qvel_new, f_last


def _rk4_substep_frozen(model: PhysicsModel, qpos, qvel, ctrl_fn, f_warm):
    """RK4 substep with stage-frozen kinematics (PhysicsModel.stage_reuse
    = 'kin'): FK, the mass-matrix inverse, the contact/limit candidate set
    and the assembled dual matrix are computed ONCE at the substep entry
    state — which IS stage 1's evaluation point (RK4's a₁ = 0) — and reused
    by stages 2-4, which re-evaluate only the velocity-dependent terms
    (bias force, actuation/PD torque, reference accelerations) and re-solve
    the dual.  Stage deltas are O(dt) in qpos, so the frozen quantities are
    perturbed O(dt); accuracy is measured in tools/warmstart_study.py and
    pinned by tests/test_ops.py budgets.

    Stages 2-4 warm-start from the previous stage's forces on the SAME
    frozen dual matrix, so the reduced ``stage_iterations`` budget applies
    to them; stage 1 uses the ``warm_iterations`` budget (its warm start —
    the previous substep's forces — crossed a state change)."""
    dt = model.dt

    # ---- substep-entry prep (== the stage-1 evaluation point) ----
    kin = kinematics.fk(model, qpos)
    m = dynamics.mass_matrix(model, kin)
    minv = mass_inverse(m)
    hi = jax.lax.Precision.HIGHEST

    def m_inv_mul(x):
        return jnp.matmul(minv, x, precision=hi)

    contacts = collision.floor_contacts(model, kin)
    limits = collision.joint_limits(model, qpos)
    system = solver.assemble_system(model, m_inv_mul, contacts, limits,
                                    dtype=qvel.dtype)
    jac = (*kinematics.com_jacobians(model, kin),
           dynamics.world_inertia(model, kin))

    warm_n = int(getattr(model, "warm_iterations", 0))
    it1 = warm_n if warm_n > 0 else None
    stage_n = int(getattr(model, "stage_iterations", 0))
    it_rest = stage_n if stage_n > 0 else it1

    def stage_forward(qp_i, qv_i, f_prev, iters):
        ctrl, qfrc = ctrl_fn(qp_i, qv_i)
        tau = (
            dynamics.actuator_force(model, ctrl)
            + dynamics.passive_force(model, qv_i)
            - dynamics.bias_force(model, kin, qv_i, jac=jac)
        )
        if qfrc is not None:
            tau = tau + qfrc
        qacc_smooth = m_inv_mul(tau)
        sol = solver.solve_system(model, system, qacc_smooth, qv_i,
                                  f_warm=(f_prev if warm_n > 0 else None),
                                  iterations=iters)
        return qacc_smooth + m_inv_mul(sol.qfrc_constraint), sol.force

    # stage 1 — exact evaluation at (qpos, qvel)
    ka1, f1 = stage_forward(qpos, qvel, f_warm, it1)

    # stages 2-4 (frozen kin, reduced budget, warm chain on the same A)
    a_coefs = jnp.asarray([0.5, 0.5, 1.0], qvel.dtype)
    b_coefs = jnp.asarray([2.0, 2.0, 1.0], qvel.dtype) / 6.0

    def stage(carry, coefs):
        a_i, b_i = coefs
        kv_prev, ka_prev, acc_v, acc_a, f_prev = carry
        qp_i = integrate_pos(model, qpos, kv_prev, dt * a_i)
        qv_i = qvel + dt * a_i * ka_prev
        ka, f_i = stage_forward(qp_i, qv_i, f_prev, it_rest)
        return (qv_i, ka, acc_v + b_i * qv_i, acc_a + b_i * ka, f_i), None

    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    carry0 = (qvel, ka1, qvel / 6.0, ka1 / 6.0, f1)
    (_, _, v_avg, a_avg, f_last), _ = jax.lax.scan(
        stage, carry0, (a_coefs, b_coefs), unroll=unroll_for("stages", 3))
    qpos_new = integrate_pos(model, qpos, v_avg, dt)
    qvel_new = qvel + dt * a_avg
    return qpos_new, qvel_new, f_last


def _substep(integrator: str):
    return _rk4_substep if integrator == "rk4" else _euler_substep


def _make_substep(model: PhysicsModel, ctrl_fn):
    """Substep closure ``(qp, qv, f_warm) → (qp', qv', f_last)`` for a
    model/controller pair, dispatching to the stage-frozen RK4 pipeline when
    ``model.stage_reuse == 'kin'`` (requires the Newton–Schulz M⁻¹ path —
    the 'cholesky' fallback's factorization is a host-side closure that
    cannot thread through the frozen prep)."""
    if (model.integrator == "rk4"
            and getattr(model, "stage_reuse", "none") == "kin"
            and getattr(model, "minv_mode", "ns") == "ns"):
        return lambda qp, qv, f: _rk4_substep_frozen(model, qp, qv,
                                                     ctrl_fn, f)
    fwd = _make_fwd(model, ctrl_fn)
    sub = _substep(model.integrator)
    return lambda qp, qv, f: sub(model, qp, qv, fwd, f)


def _make_fwd(model: PhysicsModel, ctrl_fn):
    """Stage-dynamics closure ``fwd(qp, qv, extra_damping, f_prev)``.
    ``ctrl_fn(qp, qv) → (ctrl, qfrc_applied)``.  With warm_iterations set,
    every solve warm-starts from the carried forces at the reduced budget
    (the step entry passes zeros, so the first solve is effectively a cold
    solve at that budget — validated against the divergence budgets in
    tests/test_physics.py)."""
    warm_n = int(getattr(model, "warm_iterations", 0))

    def fwd(qp, qv, extra_damping, f_prev):
        ctrl, qfrc = ctrl_fn(qp, qv)
        return forward(model, qp, qv, ctrl, extra_damping,
                       qfrc_applied=qfrc,
                       f_warm=(f_prev if warm_n > 0 else None),
                       solver_iterations=(warm_n if warm_n > 0 else None))

    return fwd


def step_euler(model: PhysicsModel, qpos, qvel, ctrl):
    fwd = _make_fwd(model, lambda qp, qv: (ctrl, None))
    f0 = jnp.zeros(_nefc_full(model), qvel.dtype)
    qp, qv, _ = _euler_substep(model, qpos, qvel, fwd, f0)
    return qp, qv


def step_rk4(model: PhysicsModel, qpos, qvel, ctrl):
    fwd = _make_fwd(model, lambda qp, qv: (ctrl, None))
    f0 = jnp.zeros(_nefc_full(model), qvel.dtype)
    qp, qv, _ = _rk4_substep(model, qpos, qvel, fwd, f0)
    return qp, qv


def pd_torque(model: PhysicsModel, target: jnp.ndarray, qpos: jnp.ndarray,
              qvel: jnp.ndarray, kp: jnp.ndarray, kd: jnp.ndarray
              ) -> jnp.ndarray:
    """DeepMimic-style joint PD: τ = kp·(target − q) − kd·q̇ on the hinge
    dofs, clamped to ± the motor gear (the per-joint TorqueLim), returned as
    a (nv,) generalized force.  The reference computes the same τ on the
    host and writes it into ``sim.data.ctrl``
    (mujoco_interface.action2torque, mujoco_interface.py:97-107)."""
    q = qpos[7:]
    qd = qvel[6:]
    # position error wrapped to (−π, π]: hinge dofs are 2π-periodic (the
    # spherical joints are euler-rxyz hinge stacks), so a target that is a
    # different 2π-representative of the same rotation — e.g. a looping
    # clip's cycle boundary — must not command a full-turn yank.  Bounded
    # joints never see |err| ≥ π, so this is the identity for them (and for
    # the reference's host loop, mujoco_interface.py:97-107, in its
    # operating range).
    err = target - q
    err = jnp.mod(err + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    tau = kp * err - kd * qd
    lim = jnp.zeros(model.nv - 6, tau.dtype).at[model.actuator_hinge].add(
        jnp.asarray(model.actuator_gear, tau.dtype))
    tau = jnp.clip(tau, -lim, lim)
    return jnp.concatenate([jnp.zeros(6, tau.dtype), tau])


def step_pd(model: PhysicsModel, qpos, qvel, target, kp, kd,
            n_substeps: int = 1):
    """Advance ``n_substeps`` steps under a PD controller tracking ``target``
    joint angles; the torque is re-evaluated from the instantaneous (q, q̇)
    at every integrator stage (stable at low control rates, unlike the
    reference's one-torque-per-control-step host loop).

    ``target`` may be ``(nu_joints,)`` — one target held for all substeps
    (the reference's behaviour) — or ``(n_substeps, nu_joints)`` — a
    per-substep target schedule.  The schedule form is how the imitation
    envs feed a moving clip reference through a multi-substep control
    period: holding one pose target for a 33 ms control step loses a 60 fps
    clip (measured: spinkick one-step tracking reward 0.476 held vs 0.741
    stepped — tools/tracking_ceiling_probe.py)."""
    return _step_pd_impl(model.integrator, model, qpos, qvel, target, kp, kd,
                         n_substeps=n_substeps)


@partial(jax.jit, static_argnums=0, static_argnames=("n_substeps",))
def _step_pd_impl(integrator: str, model: PhysicsModel, qpos, qvel, target,
                  kp, kd, n_substeps: int = 1):
    zero_ctrl = jnp.zeros(model.nu, qvel.dtype)
    f0 = jnp.zeros(_nefc_full(model), qvel.dtype)
    # (n_substeps, nu_joints) = per-substep target schedule; the substep
    # closure is traced once — the scanned target is just a carried operand
    multi = target.ndim == 2

    def body(carry, tgt):
        qp, qv, f = carry
        t = tgt if multi else target
        sub = _make_substep(
            model,
            lambda a, b: (zero_ctrl, pd_torque(model, t, a, b, kp, kd)))
        return sub(qp, qv, f), None

    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    (qpos, qvel, _), _ = jax.lax.scan(
        body, (qpos, qvel, f0),
        target if multi else None,
        length=None if multi else n_substeps,
        unroll=unroll_for("substeps",
                          target.shape[0] if multi else n_substeps))
    return qpos, qvel


@partial(jax.jit, static_argnums=0, static_argnames=("n_substeps",))
def _step_impl(integrator: str, model: PhysicsModel, qpos, qvel, ctrl,
               n_substeps: int = 1):
    sub = _make_substep(model, lambda qp, qv: (ctrl, None))
    f0 = jnp.zeros(_nefc_full(model), qvel.dtype)

    def body(carry, _):
        qp, qv, f = carry
        return sub(qp, qv, f), None

    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    (qpos, qvel, _), _ = jax.lax.scan(
        body, (qpos, qvel, f0), None, length=n_substeps,
        unroll=unroll_for("substeps", n_substeps))
    return qpos, qvel


def step(model: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
         ctrl: jnp.ndarray, n_substeps: int = 1):
    """Advance one env by ``n_substeps`` physics steps under constant ctrl
    (the reference's ``do_simulation(action, n)``)."""
    return _step_impl(model.integrator, model, qpos, qvel, ctrl,
                      n_substeps=n_substeps)
