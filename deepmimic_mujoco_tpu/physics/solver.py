"""Soft-constraint contact/limit solver.

MuJoCo-style constraint model (public solver-parameter semantics: solref =
(timeconst, dampratio), solimp = (dmin, dmax, width, mid, power)):

    aref_i = -B·(J qvel)_i - K·d(r_i)·pos_i,   B = 2/(dmax·tc),
    K = 1/(dmax²·tc²·dampratio²),
    R_i = (1-d_i)/d_i · A_ii,
    minimize_f  ½ fᵀ(A+R)f + fᵀ(J qacc_smooth - aref)   s.t.  f ∈ cone

solved in the dual with **APGD** (accelerated projected gradient descent,
Nesterov momentum, step 1/L with a Gershgorin bound on L): one batched
matvec per iteration — fully parallel across constraints and envs, unlike
MuJoCo's sequential PGS sweeps, so it maps onto the TPU MXU.  Contact
3-blocks project onto the elliptic friction cone, limit rows clamp to f ≥ 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics.collision import Contacts, Limits
from deepmimic_mujoco_tpu.physics.model import PhysicsModel

import os


def use_pallas() -> bool:
    """Whether vmapped solves dispatch to the Pallas TPU kernel
    (DMTPU_PALLAS=1/0 overrides; default OFF).

    Measured on v5e, TRPO end-to-end with the LANE-MAJOR kernel
    (ops/apgd.py, env batch in the 128-lane axis, A VMEM-resident across
    all iterations): beats XLA at every batch size — 90.4k vs 82.5k
    env-steps/s at 768 envs (+9.5%), 78.6k vs 73.3k at 2048, 44.9k vs
    43.2k at 4096 (2026-08-17).  The r1 block-layout kernel lost 2× (its
    per-env batched dot_general could not vectorize); kept behind
    DMTPU_PALLAS_LAYOUT=blocks.

    Default OFF despite the win: on the hosted-TPU tunnel the REMOTE
    Mosaic compile service can wedge for hours on large programs
    (training-sized scans; observed 2026-08-17 — even a later bench-sized
    Mosaic compile re-wedged the freshly-recovered terminal), and a wedged
    compile blocks the whole chip.  On self-hosted TPUs with local
    compilation set DMTPU_PALLAS=1 for the ~10% end-to-end win."""
    v = os.environ.get("DMTPU_PALLAS")
    if v is not None:
        return v not in ("0", "false", "off")
    return False




def _impedance(model: PhysicsModel, pos: jnp.ndarray) -> jnp.ndarray:
    dmin, dmax, width, mid, power = (model.solimp[i] for i in range(5))
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    y_lo = (x / mid) ** power * mid
    y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 1.0 - 1e-4)


def _kb(model: PhysicsModel) -> tuple[jnp.ndarray, jnp.ndarray]:
    tc, dr = model.solref[0], model.solref[1]
    dmax = model.solimp[1]
    k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
    b = 2.0 / (dmax * tc)
    return k, b


def _project_cone(f: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3) [normal, t1, t2] onto the elliptic friction cone."""
    fn = f[..., 0]
    ft = f[..., 1:]
    t = jnp.linalg.norm(ft, axis=-1)
    inside = t <= mu * fn
    below = mu * t <= -fn  # polar cone → zero
    # cone-surface projection
    fn_p = (fn + mu * t) / (1.0 + mu * mu)
    fn_p = jnp.maximum(fn_p, 0.0)
    scale = jnp.where(t > 1e-12, mu * fn_p / jnp.maximum(t, 1e-12), 0.0)
    f_proj = jnp.concatenate([fn_p[..., None], ft * scale[..., None]], axis=-1)
    f_keep = jnp.concatenate([jnp.maximum(fn, 0.0)[..., None], ft], axis=-1)
    out = jnp.where(inside[..., None], f_keep, f_proj)
    return jnp.where(below[..., None], jnp.zeros_like(out), out)


class EfcSolution(NamedTuple):
    qfrc_constraint: jnp.ndarray  # (nv,)
    force: jnp.ndarray            # (nefc,) constraint-space forces


class ConstraintSystem(NamedTuple):
    """State-dependent but velocity-independent parts of the dual problem —
    everything that can be FROZEN across integrator stages under
    ``PhysicsModel.stage_reuse='kin'`` (the stage deltas perturb these only
    O(dt)).  All fields are arrays so the tuple threads through jit/vmap."""

    j: jnp.ndarray         # (ne, nv) selected constraint Jacobian (masked)
    a_solve: jnp.ndarray   # (ne, ne) regularized dual matrix, solver dtype
    mu: jnp.ndarray        # (nc,) friction coefficient per selected contact
    d_rows: jnp.ndarray    # (ne,) impedance per row
    pos_rows: jnp.ndarray  # (ne,) constraint violation per row
    act_rows: jnp.ndarray  # (ne,) bool active mask
    c_rows: jnp.ndarray    # (nc*3,) full-layout row index per contact row
    lim_dof: jnp.ndarray   # (nl,) hinge index per selected limit row


def pgs_solve(a: jnp.ndarray, bvec: jnp.ndarray, mu: jnp.ndarray,
              nc: int, nl: int, n_sweeps: int,
              f0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sequential projected Gauss–Seidel sweeps over the same dual system —
    the structure of MuJoCo 2.0's PGS solver (the reference XML's
    ``solver="PGS"``, asset/dp_env_v3.xml:9): per contact 3-block, a
    diagonally-scaled update followed by friction-cone projection, in row
    order; limit rows clamp to f ≥ 0.

    Deliberately sequential (fori_loop over blocks) — this is the PARITY
    mode for CPU A/B runs against host MuJoCo, not the TPU hot path (APGD's
    batched matvecs are; see module docstring)."""
    ne = a.shape[0]
    diag = jnp.diagonal(a)

    def one_sweep(f, _):
        def contact_body(i, f):
            s = 3 * i
            a_blk = jax.lax.dynamic_slice(a, (s, 0), (3, ne))
            r = a_blk @ f + jax.lax.dynamic_slice(bvec, (s,), (3,))
            d = jnp.maximum(jax.lax.dynamic_slice(diag, (s,), (3,)), 1e-8)
            f_blk = jax.lax.dynamic_slice(f, (s,), (3,)) - r / d
            f_blk = _project_cone(f_blk, mu[i])
            return jax.lax.dynamic_update_slice(f, f_blk, (s,))

        f = jax.lax.fori_loop(0, nc, contact_body, f)

        def limit_body(i, f):
            s = 3 * nc + i
            r = jnp.dot(a[s], f) + bvec[s]
            fi = jnp.maximum(f[s] - r / jnp.maximum(diag[s], 1e-8), 0.0)
            return f.at[s].set(fi)

        f = jax.lax.fori_loop(0, nl, limit_body, f)
        return f, None

    if f0 is None:
        f0 = jnp.zeros(ne, a.dtype)
    f, _ = jax.lax.scan(one_sweep, f0, None, length=n_sweeps)
    return f


def _caps(model: PhysicsModel) -> tuple[int, int, int, int]:
    """(nc, nl, nc_full, nl_full) — static selection sizes."""
    nc_full = int(model.ncand)
    nl_full = int(model.nhinge)
    nc = min(getattr(model, "max_contacts", nc_full), nc_full)
    nl = min(getattr(model, "max_limits", nl_full), nl_full)
    return nc, nl, nc_full, nl_full


def assemble_system(
    model: PhysicsModel,
    m_inv_mul,                 # callable: (nv,) -> M⁻¹ x
    contacts: Contacts,
    limits: Limits,
    dtype=jnp.float32,
) -> ConstraintSystem:
    """Top-k candidate selection + Jacobian/dual-matrix assembly — the
    velocity-independent half of :func:`solve_constraints`.  The candidate
    set is reduced to the ``max_contacts``/``max_limits`` *deepest* rows via
    top-k — identical forces as long as the number of simultaneously active
    constraints stays within the caps (inactive rows contribute zero)."""
    nv = model.nv
    nc, nl, _, _ = _caps(model)

    # ---- top-k selection of deepest candidates (static shapes) ----
    _, c_sel = jax.lax.top_k(-contacts.pos, nc)
    _, l_sel = jax.lax.top_k(-limits.pos, nl)
    contacts = Contacts(pos=contacts.pos[c_sel], active=contacts.active[c_sel],
                        jac=contacts.jac[c_sel], mu=contacts.mu[c_sel])
    limits_sel = Limits(pos=limits.pos[l_sel], active=limits.active[l_sel],
                        sign=limits.sign[l_sel])
    lim_dof = l_sel  # hinge index per selected limit row

    # ---- assemble constraint rows (static shape, masked) ----
    c_act = contacts.active[:, None]
    j_c = jnp.where(c_act[..., None], contacts.jac, 0.0).reshape(nc * 3, nv)

    # limit rows: ±e_{6+dof}
    j_l = jnp.zeros((nl, nv), dtype)
    j_l = j_l.at[jnp.arange(nl), 6 + lim_dof].set(limits_sel.sign)
    j_l = jnp.where(limits_sel.active[:, None], j_l, 0.0)

    j = jnp.concatenate([j_c, j_l], axis=0)  # (ne, nv)

    d_c = _impedance(model, contacts.pos)
    d_l = _impedance(model, limits_sel.pos)
    pos_rows = jnp.concatenate(
        [
            jnp.stack([contacts.pos, jnp.zeros_like(contacts.pos),
                       jnp.zeros_like(contacts.pos)], axis=-1).reshape(-1),
            limits_sel.pos,
        ]
    )
    d_rows = jnp.concatenate(
        [jnp.repeat(d_c, 3), d_l]
    )
    act_rows = jnp.concatenate(
        [jnp.repeat(contacts.active, 3), limits_sel.active]
    )

    # ---- dual system ----
    minv_jt = jax.vmap(m_inv_mul, in_axes=0)(j)  # rows: M⁻¹ jᵀ per row → (ne, nv)
    a = j @ minv_jt.T  # (ne, ne)
    diag_a = jnp.diagonal(a)
    r = (1.0 - d_rows) / d_rows * jnp.maximum(diag_a, 1e-8)
    r = jnp.where(act_rows, r, 1.0)
    a = a + jnp.diag(r)
    a_solve = a
    if (getattr(model, "solver_mode", "apgd") != "pgs"
            and getattr(model, "solver_dtype", "f32") == "bf16"):
        # bf16 storage halves the bytes every APGD pass re-streams
        # (iterates/b/projections stay f32; see PhysicsModel.solver_dtype)
        a_solve = a.astype(jnp.bfloat16)

    c_rows = (c_sel[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
    return ConstraintSystem(j=j, a_solve=a_solve, mu=contacts.mu,
                            d_rows=d_rows, pos_rows=pos_rows,
                            act_rows=act_rows, c_rows=c_rows, lim_dof=lim_dof)


def solve_system(
    model: PhysicsModel,
    system: ConstraintSystem,
    qacc_smooth: jnp.ndarray,  # (nv,)
    qvel: jnp.ndarray,
    f_warm: jnp.ndarray | None = None,   # (ncand*3 + nl_full,) warm start
    iterations: int | None = None,
) -> EfcSolution:
    """Velocity-dependent half of :func:`solve_constraints`: reference
    accelerations + the iterative dual solve on an (optionally frozen)
    assembled system.  Returns forces scattered back to the full candidate
    layout.

    ``f_warm`` (full candidate layout, e.g. a previous stage's
    ``EfcSolution.force``) warm-starts the iterative solve: the returned
    solution for a nearby state is a far better initial iterate than zero,
    so a reduced ``iterations`` budget reaches the same accuracy — the
    integrator exploits this across RK4 stages/substeps (engine._rk4_substep,
    PhysicsModel.warm_iterations)."""
    nc, nl, nc_full, nl_full = _caps(model)
    dtype = qacc_smooth.dtype
    ne = nc * 3 + nl

    k, b = _kb(model)
    vel = system.j @ qvel
    aref = -b * vel - k * system.d_rows * system.pos_rows
    aref = jnp.where(system.act_rows, aref, 0.0)
    bvec = system.j @ qacc_smooth - aref

    n_iters = int(model.iterations) if iterations is None else int(iterations)
    # warm start: gather the previous solution's rows for the current
    # selection (selection may differ between stages — full-layout carry
    # makes the warm start selection-independent)
    if f_warm is None:
        f0 = jnp.zeros(ne, dtype)
    else:
        f0 = jnp.concatenate(
            [f_warm[system.c_rows], f_warm[nc_full * 3 + system.lim_dof]])
        f0 = jnp.where(system.act_rows, f0, 0.0)

    if getattr(model, "solver_mode", "apgd") == "pgs":
        # PGS-compatible sequential sweeps (parity mode for CPU A/B runs)
        f = pgs_solve(system.a_solve, bvec, system.mu, int(nc), int(nl),
                      n_iters, f0)
    else:
        # APGD iteration (Pallas kernel under vmap on TPU; XLA scan
        # otherwise — see ops/apgd.py)
        from deepmimic_mujoco_tpu.ops.apgd import make_apgd

        apgd = make_apgd(n_iters, int(nc), int(nl), use_pallas())
        f = apgd(system.a_solve, bvec, system.mu, f0)
    f = jnp.where(system.act_rows, f, 0.0)

    qfrc = system.j.T @ f

    # scatter forces back to the full candidate layout
    full = jnp.zeros(nc_full * 3 + nl_full, dtype)
    full = full.at[system.c_rows].set(f[: nc * 3])
    full = full.at[nc_full * 3 + system.lim_dof].set(f[nc * 3:])
    return EfcSolution(qfrc_constraint=qfrc, force=full)


def solve_constraints(
    model: PhysicsModel,
    m_inv_mul,                 # callable: (nv,) -> M⁻¹ x
    qacc_smooth: jnp.ndarray,  # (nv,)
    qvel: jnp.ndarray,
    contacts: Contacts,
    limits: Limits,
    f_warm: jnp.ndarray | None = None,   # (ncand*3 + nl_full,) warm start
    iterations: int | None = None,
) -> EfcSolution:
    """Solve for constraint forces: :func:`assemble_system` +
    :func:`solve_system` (split so the integrator can freeze the assembled
    system across stages — PhysicsModel.stage_reuse)."""
    system = assemble_system(model, m_inv_mul, contacts, limits,
                             dtype=qacc_smooth.dtype)
    return solve_system(model, system, qacc_smooth, qvel, f_warm=f_warm,
                        iterations=iterations)
