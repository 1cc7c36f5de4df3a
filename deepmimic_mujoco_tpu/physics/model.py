"""Physics model specification.

A :class:`PhysicsModel` is a static pytree of arrays describing a kinematic
tree: one (optional) free root + hinge chains, geoms for collision/inertia,
motors, and solver options.  It is the TPU-native replacement for MuJoCo's
``MjModel`` over the MJCF subset the reference uses
(/root/reference/src/mujoco/humanoid_deepmimic/envs/asset/dp_env_v3.xml):
free root, stacked hinge joints anchored at body origins, sphere/capsule/box
geoms, per-joint armature/damping/limits, torque motors with gear and
ctrlrange, plane floor.

Models are built host-side with :class:`ModelBuilder` (numpy) and then used
as jittable constants inside the JAX step functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

from deepmimic_mujoco_tpu.physics import inertia as geom_inertia_mod
from deepmimic_mujoco_tpu.physics.inertia import BOX, CAPSULE, PLANE, SPHERE


@dataclasses.dataclass(frozen=True)
class PhysicsModel:
    """Static physics model. Array fields are jax/numpy arrays (pytree
    leaves); tuple/str/float fields are static metadata."""

    # --- tree ---
    body_pos: Any        # (nbody, 3) fixed offset in parent frame
    body_quat: Any       # (nbody, 4) fixed rotation in parent frame (wxyz)
    body_mass: Any       # (nbody,)
    body_com: Any        # (nbody, 3) local COM
    body_inertia: Any    # (nbody, 3, 3) about COM, body frame
    # --- hinges (all non-root dofs) ---
    hinge_body: Any      # (nh,) int32
    hinge_axis: Any      # (nh, 3) local axis
    hinge_range: Any     # (nh, 2)
    hinge_limited: Any   # (nh,) bool
    armature: Any        # (nh,)
    damping: Any         # (nh,)
    # --- actuators ---
    actuator_hinge: Any  # (nu,) int32 hinge index
    actuator_gear: Any   # (nu,)
    ctrl_range: Any      # (nu, 2)
    # --- geoms ---
    geom_body: Any       # (ngeom,) int32
    geom_pos: Any        # (ngeom, 3)
    geom_quat: Any       # (ngeom, 4)
    geom_size: Any       # (ngeom, 3)
    # --- floor-contact candidates (static shape) ---
    cand_body: Any       # (ncand,) int32
    cand_pos: Any        # (ncand, 3) local point (sphere/capsule-end center or box corner)
    cand_radius: Any     # (ncand,)
    cand_mu: Any         # (ncand,) tangential friction coefficient
    # --- dof structure ---
    ancestor_mask: Any   # (nbody, nv) 1.0 where dof moves body
    # --- initial state ---
    qpos0: Any           # (nq,)
    # --- options ---
    gravity: Any         # (3,)
    solref: Any          # (2,) timeconst, dampratio
    solimp: Any          # (5,) dmin, dmax, width, midpoint, power
    # --- static metadata ---
    parent: tuple = ()                # per-body parent index, -1 = world (static topology)
    max_contacts: int = 1 << 30       # top-k cap on simultaneous floor contacts
    max_limits: int = 1 << 30         # top-k cap on simultaneous limit rows
    # M⁻¹ algorithm: "ns" = Jacobi-scaled Newton–Schulz (pure matmuls, fast
    # on the MXU; iteration budget tuned for κ(D^-1/2MD^-1/2)≲20) or
    # "cholesky" (XLA batched solve — slower, unconditionally robust).
    # engine.calibrate_minv_mode() measures the NS residual for a model and
    # picks; the MJCF importer runs it for arbitrary imported models.
    minv_mode: str = "ns"
    # constraint solver: "apgd" (batched Nesterov PGD — the TPU hot path) or
    # "pgs" (sequential projected Gauss–Seidel sweeps, the structure of the
    # reference's MuJoCo PGS — for CPU parity A/B runs)
    solver_mode: str = "apgd"
    dt: float = 0.0166
    iterations: int = 50
    # >0 enables warm-started solves: every constraint solve within a
    # control step starts from the previous integrator stage/substep's
    # forces (the first solve of the step starts from zero) and uses this
    # REDUCED uniform iteration budget.  The dual problems of adjacent
    # stages differ only O(dt), so a warm iterate reaches cold-``iterations``
    # accuracy in far fewer passes — and every APGD pass re-streams the
    # (B, ne, ne) dual matrix from HBM, the rollout's dominant bandwidth
    # cost.  0 = cold solves at ``iterations`` everywhere (legacy).
    warm_iterations: int = 0
    # dtype the assembled dual matrix A is STORED in for the APGD solve:
    # "bf16" halves the bytes every APGD pass re-streams from HBM (the
    # rollout's dominant bandwidth cost; iterates/b/projections stay f32).
    # A is perturbed ~0.4% relative — far below the 50-iteration truncation
    # already accepted.  "f32" = exact legacy behaviour.  PGS (the CPU
    # parity mode) always solves in f32.
    solver_dtype: str = "f32"
    # stage reuse across the integrator stages of one substep:
    #   "none"  legacy — every RK4 stage re-runs FK, CRBA, the M⁻¹ Newton–
    #           Schulz iteration, collision and dual-matrix assembly
    #   "kin"   freeze kinematics at the substep entry state: FK / M⁻¹ /
    #           contact set / dual matrix A are computed ONCE (at stage 1,
    #           whose evaluation point IS the entry state — RK4's a₁=0) and
    #           reused by stages 2-4, which re-evaluate only the velocity-
    #           dependent terms (bias force, actuation/PD torque, aref) and
    #           re-solve the dual with the frozen A.  Stage deltas are O(dt)
    #           in qpos, so the frozen quantities are perturbed O(dt) —
    #           accuracy measured in tools/warmstart_study.py (stage_kin
    #           rows) and pinned by tests/test_ops.py::TestWarmIntegration.
    #           Cuts the Newton–Schulz HBM traffic (the rollout's largest
    #           byte stream) and the FK/CRBA/collision op chains 4×.
    stage_reuse: str = "none"
    # with stage_reuse="kin": iteration budget for stages AFTER the first
    # (they warm-start from the previous stage's forces on the SAME frozen
    # dual matrix, so far fewer passes reach the same accuracy).  0 = use
    # the stage-1 budget (warm_iterations or iterations) everywhere.
    stage_iterations: int = 0
    integrator: str = "rk4"           # "rk4" | "euler"
    nbody: int = 0
    nq: int = 0
    nv: int = 0
    nhinge: int = 0
    nu: int = 0
    ncand: int = 0
    body_hinges: tuple = ()           # tuple[tuple[int, ...]] per body
    geom_type: tuple = ()             # tuple[int] per geom (static: drives collision code)
    body_names: tuple = ()
    geom_names: tuple = ()
    hinge_names: tuple = ()

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def geom_index(self, name: str) -> int:
        return self.geom_names.index(name)


jax.tree_util.register_dataclass(
    PhysicsModel,
    data_fields=[
        "body_pos", "body_quat", "body_mass", "body_com",
        "body_inertia", "hinge_body", "hinge_axis", "hinge_range",
        "hinge_limited", "armature", "damping", "actuator_hinge",
        "actuator_gear", "ctrl_range", "geom_body", "geom_pos", "geom_quat",
        "geom_size", "cand_body", "cand_pos", "cand_radius", "cand_mu",
        "ancestor_mask", "qpos0", "gravity", "solref", "solimp",
    ],
    meta_fields=[
        "parent", "max_contacts", "max_limits", "minv_mode", "solver_mode",
        "dt", "iterations", "warm_iterations", "solver_dtype", "stage_reuse",
        "stage_iterations", "integrator",
        "nbody", "nq", "nv", "nhinge", "nu", "ncand", "body_hinges",
        "geom_type", "body_names", "geom_names", "hinge_names",
    ],
)


@dataclasses.dataclass
class _Body:
    name: str
    parent: int
    pos: np.ndarray
    quat: np.ndarray


@dataclasses.dataclass
class _Hinge:
    name: str
    body: int
    axis: np.ndarray
    range: tuple
    limited: bool
    armature: float
    damping: float


@dataclasses.dataclass
class _Geom:
    name: str
    body: int
    gtype: int
    size: np.ndarray
    pos: np.ndarray
    quat: np.ndarray
    mass: float
    friction: np.ndarray
    condim: int


def _zaxis_quat(fromto: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Capsule fromto → (center pos, geom quat aligning z to segment, half-length)."""
    a, b = fromto[:3], fromto[3:]
    center = 0.5 * (a + b)
    d = b - a
    L = np.linalg.norm(d)
    z = d / L
    # rotation taking (0,0,1) to z
    v = np.cross([0.0, 0.0, 1.0], z)
    c = np.dot([0.0, 0.0, 1.0], z)
    if np.linalg.norm(v) < 1e-12:
        quat = np.array([1.0, 0, 0, 0]) if c > 0 else np.array([0.0, 1.0, 0, 0])
    else:
        s = np.sqrt((1 + c) * 2)
        quat = np.concatenate([[s / 2], v / s])
        quat = quat / np.linalg.norm(quat)
    return center, quat, L / 2


class ModelBuilder:
    """Programmatic model construction (MJCF-equivalent API surface)."""

    def __init__(self, dt: float = 0.0166, integrator: str = "rk4",
                 iterations: int = 50, gravity=(0.0, 0.0, -9.81),
                 max_contacts: int = 1 << 30, max_limits: int = 1 << 30):
        self.max_contacts = max_contacts
        self.max_limits = max_limits
        self.bodies: list[_Body] = []
        self.hinges: list[_Hinge] = []
        self.geoms: list[_Geom] = []
        self.actuators: list[tuple] = []  # (hinge_name, gear, ctrl_lo, ctrl_hi)
        self.dt = dt
        self.integrator = integrator
        self.iterations = iterations
        self.gravity = np.asarray(gravity, np.float64)
        self.solref = np.array([0.02, 1.0])
        self.solimp = np.array([0.9, 0.95, 0.001, 0.5, 2.0])
        self.floor_friction = np.array([1.0, 0.1, 0.1])
        self.root_pos_init: Optional[np.ndarray] = None

    # -- construction API -------------------------------------------------
    def add_body(self, name: str, parent: Optional[str], pos=(0, 0, 0),
                 quat=(1, 0, 0, 0)) -> int:
        pidx = -1 if parent is None else self.body_index(name=parent)
        self.bodies.append(_Body(name, pidx, np.asarray(pos, np.float64),
                                 np.asarray(quat, np.float64)))
        return len(self.bodies) - 1

    def body_index(self, name: str) -> int:
        for i, b in enumerate(self.bodies):
            if b.name == name:
                return i
        raise KeyError(name)

    def add_hinge(self, name: str, body: str, axis, range=(0.0, 0.0),
                  limited: bool = True, armature: float = 1.0,
                  damping: float = 1.0) -> int:
        a = np.asarray(axis, np.float64)
        self.hinges.append(_Hinge(name, self.body_index(body),
                                  a / np.linalg.norm(a), tuple(range),
                                  limited, armature, damping))
        return len(self.hinges) - 1

    def add_geom(self, name: str, body: str, gtype: int, mass: float,
                 size=(0.0, 0.0, 0.0), pos=(0, 0, 0), quat=(1, 0, 0, 0),
                 fromto=None, friction=(1.0, 0.005, 0.0001), condim: int = 1) -> int:
        size = np.asarray(size, np.float64)
        pos = np.asarray(pos, np.float64)
        quat = np.asarray(quat, np.float64)
        if fromto is not None:
            pos, quat, half_len = _zaxis_quat(np.asarray(fromto, np.float64))
            size = np.array([size[0], half_len, 0.0])
        self.geoms.append(_Geom(name, self.body_index(body), gtype, size,
                                pos, quat, mass, np.asarray(friction), condim))
        return len(self.geoms) - 1

    def add_motor(self, hinge_name: str, gear: float,
                  ctrl_range=(-0.5, 0.5)) -> None:
        self.actuators.append((hinge_name, gear, ctrl_range[0], ctrl_range[1]))

    # -- finalization ------------------------------------------------------
    def finalize(self, root_pos=(0.0, 0.0, 0.9),
                 root_quat=(1.0, 0.0, 0.0, 0.0)) -> PhysicsModel:
        nbody = len(self.bodies)
        nh = len(self.hinges)
        nq, nv = 7 + nh, 6 + nh

        # body inertias from geoms (MuJoCo inertiafromgeom)
        body_mass = np.zeros(nbody)
        body_com = np.zeros((nbody, 3))
        body_inertia = np.zeros((nbody, 3, 3))
        from deepmimic_mujoco_tpu.utils import quaternion as quat_lib
        for i in range(nbody):
            gs = [g for g in self.geoms if g.body == i]
            if not gs:
                body_mass[i] = 0.0
                continue
            masses = [g.mass for g in gs]
            coms = [g.pos for g in gs]
            inertias = [geom_inertia_mod.geom_inertia(g.gtype, g.size, g.mass) for g in gs]
            rots = [np.asarray(quat_lib.to_mat(g.quat), np.float64) for g in gs]
            m, c, I = geom_inertia_mod.combine_inertia(masses, coms, inertias, rots)
            body_mass[i], body_com[i], body_inertia[i] = m, c, I

        # per-body hinge lists (order of declaration)
        body_hinges = tuple(
            tuple(j for j, h in enumerate(self.hinges) if h.body == i)
            for i in range(nbody)
        )

        # floor-contact candidates
        cand_body, cand_pos, cand_radius, cand_mu = [], [], [], []
        for g in self.geoms:
            mu = float(np.maximum(g.friction, self.floor_friction)[0])
            rot = np.asarray(quat_lib.to_mat(g.quat), np.float64)
            if g.gtype == SPHERE:
                pts, r = [g.pos], g.size[0]
            elif g.gtype == CAPSULE:
                h = g.size[1]
                pts = [g.pos + rot @ [0, 0, h], g.pos + rot @ [0, 0, -h]]
                r = g.size[0]
            elif g.gtype == BOX:
                a, b, c = g.size
                pts = [g.pos + rot @ [sx * a, sy * b, sz * c]
                       for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
                r = 0.0
            else:
                continue
            for p in pts:
                cand_body.append(g.body)
                cand_pos.append(p)
                cand_radius.append(r)
                cand_mu.append(mu)

        qpos0 = np.zeros(nq)
        qpos0[0:3] = np.asarray(root_pos)
        rq = np.asarray(root_quat, np.float64)
        qpos0[3:7] = rq / np.linalg.norm(rq)

        # ancestor mask: dof d moves body i iff the dof's body is an
        # ancestor-or-self of i.  Root free-joint dofs (0..5) move everything.
        def ancestors(i: int) -> set:
            out = set()
            while i >= 0:
                out.add(i)
                i = self.bodies[i].parent
            return out

        ancestor_mask = np.zeros((nbody, nv))
        ancestor_mask[:, 0:6] = 1.0
        anc = [ancestors(i) for i in range(nbody)]
        for j, h in enumerate(self.hinges):
            for i in range(nbody):
                if h.body in anc[i]:
                    ancestor_mask[i, 6 + j] = 1.0

        f32 = lambda x: np.asarray(x, np.float32)
        i32 = lambda x: np.asarray(x, np.int32)

        return PhysicsModel(
            max_contacts=int(self.max_contacts),
            max_limits=int(self.max_limits),
            parent=tuple(b.parent for b in self.bodies),
            body_pos=f32([b.pos for b in self.bodies]),
            body_quat=f32([b.quat for b in self.bodies]),
            body_mass=f32(body_mass),
            body_com=f32(body_com),
            body_inertia=f32(body_inertia),
            hinge_body=i32([h.body for h in self.hinges]),
            hinge_axis=f32([h.axis for h in self.hinges]),
            hinge_range=f32([h.range for h in self.hinges]),
            hinge_limited=np.asarray([h.limited for h in self.hinges], bool),
            armature=f32([h.armature for h in self.hinges]),
            damping=f32([h.damping for h in self.hinges]),
            actuator_hinge=i32([
                next(j for j, h in enumerate(self.hinges) if h.name == nm)
                for nm, _, _, _ in self.actuators
            ]),
            actuator_gear=f32([g for _, g, _, _ in self.actuators]),
            ctrl_range=f32([[lo, hi] for _, _, lo, hi in self.actuators]),
            geom_body=i32([g.body for g in self.geoms]),
            geom_pos=f32([g.pos for g in self.geoms]),
            geom_quat=f32([g.quat for g in self.geoms]),
            geom_size=f32([g.size for g in self.geoms]),
            cand_body=i32(cand_body),
            cand_pos=f32(cand_pos),
            cand_radius=f32(cand_radius),
            cand_mu=f32(cand_mu),
            ancestor_mask=f32(ancestor_mask),
            qpos0=f32(qpos0),
            gravity=f32(self.gravity),
            solref=f32(self.solref),
            solimp=f32(self.solimp),
            dt=float(self.dt),
            iterations=int(self.iterations),
            integrator=self.integrator,
            nbody=nbody,
            nq=nq,
            nv=nv,
            nhinge=nh,
            nu=len(self.actuators),
            ncand=len(cand_body),
            body_hinges=body_hinges,
            geom_type=tuple(g.gtype for g in self.geoms),
            body_names=tuple(b.name for b in self.bodies),
            geom_names=tuple(g.name for g in self.geoms),
            hinge_names=tuple(h.name for h in self.hinges),
        )
