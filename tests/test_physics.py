"""Physics engine validation against real MuJoCo (host C engine).

Tolerance ladder (SURVEY.md §7 "hard parts"):
* static quantities (FK, mass matrix, bias forces): ~f32 precision
* smooth (contact-free) trajectories: tight per-step agreement
* constrained trajectories (contacts/limits): qualitative — stiff constraint
  + different solver (our APGD vs MuJoCo Newton) diverge pointwise; we check
  physical invariants (no fall-through, settling, force balance) instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from deepmimic_mujoco_tpu.physics import build_humanoid, engine  # noqa: E402
from deepmimic_mujoco_tpu.physics import collision, dynamics, kinematics  # noqa: E402
from deepmimic_mujoco_tpu.physics.humanoid import to_mjcf  # noqa: E402


@pytest.fixture(scope="module")
def model():
    # solver-exactness tests pin the legacy exact-cold configuration; the
    # production default (warm + bf16 dual storage + stage-frozen RK4) has
    # its own budget tests in tests/test_ops.py TestWarmIntegration.
    # stage_reuse="none" matters: the r4 default flip to stage-frozen
    # kinematics silently put these MuJoCo-pointwise tests on the O(dt)
    # frozen approximation (airborne trajectory drifted to 1.7e-3 > the
    # 1e-3 budget).
    return build_humanoid(warm_iterations=0, solver_dtype="f32",
                          stage_reuse="none")


@pytest.fixture(scope="module")
def mj_model():
    return mujoco.MjModel.from_xml_string(to_mjcf())


@pytest.fixture(scope="module")
def rand_state(mj_model):
    rng = np.random.RandomState(0)
    qpos = np.zeros(mj_model.nq)
    qpos[:3] = [0.1, 0.2, 1.0]
    q = rng.randn(4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.uniform(-0.5, 0.5, 28)
    qvel = rng.randn(mj_model.nv) * 0.5
    return qpos, qvel


class TestModel:
    def test_sizes(self, model, mj_model):
        assert (model.nq, model.nv, model.nu) == (35, 34, 28)
        assert (mj_model.nq, mj_model.nv, mj_model.nu) == (35, 34, 28)

    def test_total_mass_45kg(self, model, mj_model):
        assert float(np.sum(np.asarray(model.body_mass))) == pytest.approx(45.0)
        assert mj_model.body_mass.sum() == pytest.approx(45.0)

    def test_body_inertia_matches_mujoco(self, model, mj_model):
        # compare principal moments (MuJoCo stores diagonal in principal frame)
        for i in range(model.nbody):
            mine = np.sort(np.linalg.eigvalsh(np.asarray(model.body_inertia[i], np.float64)))
            theirs = np.sort(mj_model.body_inertia[1 + i])
            np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-9)

    def test_candidate_contacts(self, model):
        # 5 spheres + 8 capsules x 2 + 2 boxes x 8 = 37
        assert model.ncand == 37


class TestStaticsVsMujoco:
    def test_fk(self, model, mj_model, rand_state):
        qpos, _ = rand_state
        d = mujoco.MjData(mj_model)
        d.qpos[:] = qpos
        mujoco.mj_forward(mj_model, d)
        kin = kinematics.fk(model, jnp.asarray(qpos, jnp.float32))
        np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos[1:], atol=1e-5)
        np.testing.assert_allclose(np.asarray(kin.xcom), d.xipos[1:], atol=1e-5)
        xq, mq = np.asarray(kin.xquat), d.xquat[1:]
        sign = np.sign(np.sum(xq * mq, axis=1, keepdims=True))
        np.testing.assert_allclose(xq, mq * sign, atol=1e-5)

    def test_mass_matrix(self, model, mj_model, rand_state):
        qpos, _ = rand_state
        d = mujoco.MjData(mj_model)
        d.qpos[:] = qpos
        mujoco.mj_forward(mj_model, d)
        kin = kinematics.fk(model, jnp.asarray(qpos, jnp.float32))
        m_mine = np.asarray(dynamics.mass_matrix(model, kin), np.float64)
        m_full = np.zeros((mj_model.nv, mj_model.nv))
        mujoco.mj_fullM(mj_model, d, m_full)
        np.testing.assert_allclose(m_mine, m_full, atol=1e-4)

    def test_bias_force(self, model, mj_model, rand_state):
        qpos, qvel = rand_state
        d = mujoco.MjData(mj_model)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj_model, d)
        kin = kinematics.fk(model, jnp.asarray(qpos, jnp.float32))
        bias = np.asarray(
            dynamics.bias_force(model, kin, jnp.asarray(qvel, jnp.float32)), np.float64
        )
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-3)

    def test_forward_qacc_smooth(self, model, mj_model, rand_state):
        """Contact-free constrained forward == MuJoCo qacc (joints inside
        limits, body airborne)."""
        rng = np.random.RandomState(1)
        qpos = np.asarray(model.qpos0, np.float64).copy()
        qpos[2] = 50.0
        lo, hi = mj_model.jnt_range[1:, 0], mj_model.jnt_range[1:, 1]
        qpos[7:] = 0.5 * (lo + hi)
        qvel = rng.randn(34) * 0.5
        ctrl = rng.uniform(-0.3, 0.3, 28)
        d = mujoco.MjData(mj_model)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, d)
        fwd = engine.forward(
            model, jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32),
            jnp.asarray(ctrl, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(fwd.qacc, np.float64), d.qacc, atol=5e-3)


class TestTrajectories:
    def test_airborne_trajectory_matches(self, model, mj_model):
        """Smooth-regime stepping tracks MuJoCo tightly for 10 steps."""
        rng = np.random.RandomState(1)
        qpos = np.asarray(model.qpos0, np.float64).copy()
        qpos[2] = 50.0
        lo, hi = mj_model.jnt_range[1:, 0], mj_model.jnt_range[1:, 1]
        qpos[7:] = 0.5 * (lo + hi)
        qvel = rng.randn(34) * 0.05
        ctrl = rng.uniform(-0.05, 0.05, 28)
        d = mujoco.MjData(mj_model)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        step = jax.jit(
            lambda qp, qv: engine.step(model, qp, qv, jnp.asarray(ctrl, jnp.float32))
        )
        qp, qv = jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32)
        for _ in range(10):
            qp, qv = step(qp, qv)
            mujoco.mj_step(mj_model, d)
        assert d.nefc == 0, "test invalid: constraints became active in MuJoCo"
        np.testing.assert_allclose(np.asarray(qp, np.float64), d.qpos, atol=1e-4)
        np.testing.assert_allclose(np.asarray(qv, np.float64), d.qvel, atol=1e-3)

    def test_drop_no_fallthrough_and_settles(self, model):
        """Passive humanoid drop: feet contact holds, motion decays."""
        step = jax.jit(lambda qp, qv: engine.step(model, qp, qv, jnp.zeros(28)))
        qp = jnp.asarray(model.qpos0)
        qv = jnp.zeros(34, jnp.float32)
        z_min = 10.0
        for i in range(150):
            qp, qv = step(qp, qv)
            z_min = min(z_min, float(qp[2]))
        assert z_min > 0.0, f"root fell through the floor (min z {z_min})"
        assert float(qp[2]) > 0.05
        assert np.isfinite(np.asarray(qp)).all()

    def test_determinism(self, model):
        step = jax.jit(lambda qp, qv: engine.step(model, qp, qv, jnp.zeros(28)))
        outs = []
        for _ in range(2):
            qp = jnp.asarray(model.qpos0)
            qv = jnp.zeros(34, jnp.float32)
            for _ in range(20):
                qp, qv = step(qp, qv)
            outs.append(np.asarray(qp))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_vmap_batch(self, model):
        """Batched stepping: vmapped over envs, one program."""
        batch_step = jax.jit(
            jax.vmap(lambda qp, qv, c: engine.step(model, qp, qv, c),
                     in_axes=(0, 0, 0))
        )
        B = 4
        qp = jnp.tile(jnp.asarray(model.qpos0), (B, 1))
        qv = jnp.zeros((B, 34), jnp.float32)
        ctrl = jnp.zeros((B, 28), jnp.float32)
        qp2, qv2 = batch_step(qp, qv, ctrl)
        assert qp2.shape == (B, 35)
        # identical inputs → identical outputs across the batch
        np.testing.assert_array_equal(np.asarray(qp2[0]), np.asarray(qp2[1]))


class TestMassInverse:
    """Newton-Schulz explicit inverse (engine.mass_inverse) — MXU-friendly
    replacement for batched Cholesky."""

    def test_residual_at_f32_floor(self):
        import jax
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import (build_humanoid, dynamics,
                                                  engine, kinematics)

        model = build_humanoid()
        key = jax.random.PRNGKey(0)
        # random reachable poses: clip hinge angles into their ranges
        lo, hi = model.hinge_range[:, 0], model.hinge_range[:, 1]
        qs = []
        for i in range(8):
            key, k1, k2 = jax.random.split(key, 3)
            hinges = lo + (hi - lo) * jax.random.uniform(k1, (model.nv - 6,))
            quat = jax.random.normal(k2, (4,))
            quat = quat / jnp.linalg.norm(quat)
            qs.append(jnp.concatenate([jnp.array([0., 0., 1.]), quat, hinges]))
        qpos = jnp.stack(qs)
        m = jax.vmap(lambda q: dynamics.mass_matrix(
            model, kinematics.fk(model, q)))(qpos)
        minv = jax.vmap(engine.mass_inverse)(m)
        eye = jnp.eye(model.nv)
        resid = jnp.abs(jnp.matmul(minv, m,
                                   precision=jax.lax.Precision.HIGHEST) - eye)
        assert float(resid.max()) < 1e-4, float(resid.max())

    def test_calibrate_minv_mode_keeps_ns_for_humanoid(self):
        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = engine.calibrate_minv_mode(build_humanoid())
        assert model.minv_mode == "ns"

    def test_cholesky_mode_matches_ns_dynamics(self):
        """The robust fallback path computes the same forward dynamics."""
        import dataclasses

        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = build_humanoid()
        model_chol = dataclasses.replace(model, minv_mode="cholesky")
        qpos = model.qpos0
        qvel = 0.1 * jnp.ones(model.nv)
        ctrl = 0.2 * jnp.ones(model.nu)
        f_ns = engine.forward(model, qpos, qvel, ctrl)
        f_ch = engine.forward(model_chol, qpos, qvel, ctrl)
        np.testing.assert_allclose(np.asarray(f_ns.qacc),
                                   np.asarray(f_ch.qacc), atol=2e-2,
                                   rtol=1e-3)

    def test_calibration_flags_ill_conditioned_model(self):
        """A mass matrix the NS budget cannot invert to tolerance must fall
        back to Cholesky (the advisor's imported-MJCF concern)."""
        import dataclasses

        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = build_humanoid()
        # blow up conditioning: one enormous body mass + huge armature skew
        bm = np.asarray(model.body_mass).copy()
        bm[1] *= 1e6
        arma = np.asarray(model.armature).copy()
        arma[:4] = 1e5
        bad = dataclasses.replace(
            model, body_mass=jnp.asarray(bm), armature=jnp.asarray(arma))
        bad = engine.calibrate_minv_mode(bad)
        # either the budget still converges (fine) or the mode flipped;
        # assert the decision is consistent with the measured residual
        worst = float(engine.ns_inverse_residual(bad, bad.qpos0))
        if bad.minv_mode == "ns":
            assert worst < 1e-4
        else:
            assert worst >= 1e-4


class TestPGSSolverMode:
    """The PGS-compatible sequential-sweep solver (parity mode)."""

    def test_pgs_converges_to_apgd_solution(self):
        """Both solvers minimize the same strictly-convex dual QCQP → they
        agree at convergence (measured: 11% rel diff at the default 50-iter
        budget from different truncation paths, 0.65% at 200, 0.016% at
        600)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = dataclasses.replace(
            build_humanoid(solver_dtype="f32"), iterations=200)
        model_pgs = dataclasses.replace(model, solver_mode="pgs")
        # drop from slightly above the floor → several active contacts
        qpos = jnp.asarray(model.qpos0).at[2].add(-0.12)
        qvel = jnp.zeros(model.nv).at[2].set(-1.0)
        ctrl = jnp.zeros(model.nu)
        f_a = engine.forward(model, qpos, qvel, ctrl)
        f_p = engine.forward(model_pgs, qpos, qvel, ctrl)
        qa, qp_ = np.asarray(f_a.qacc), np.asarray(f_p.qacc)
        assert np.isfinite(qp_).all()
        denom = np.maximum(np.abs(qa).max(), 1.0)
        assert np.abs(qa - qp_).max() / denom < 0.02, \
            np.abs(qa - qp_).max() / denom

    def test_p_controller_tracking_ab_budget(self):
        """The env_torque_test analogue (reference env_torque_test.py:13-43)
        as a cross-backend A/B budget: a weak P-controller tracks the walk
        clip through (a) the JAX engine (APGD), (b) the PGS parity mode and
        (c) host MuJoCo, over 60 contact-rich steps.  Trajectories are
        chaotic after contact; the *controller-level* behaviour must agree:
        per-step weighted pose error within budget and the fall time within
        a couple of control steps.  Measured 2026-08-17: first-20-step mean
        |Δpose_err| APGD↔MuJoCo 0.096 rad, PGS↔MuJoCo 0.094 rad, fall step
        24/24/26 — the sequential-sweep structure is NOT the divergence
        driver (see BASELINE.md 'bit-exactness' note)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.envs import rewards
        from deepmimic_mujoco_tpu.mocap.registry import get_clip
        from deepmimic_mujoco_tpu.physics import build_humanoid, engine
        from deepmimic_mujoco_tpu.physics.mj_host import MJHostDynamics

        clip = get_clip("walk")
        # the documented A/B numbers were measured in the exact-cold config
        model = build_humanoid(warm_iterations=0, solver_dtype="f32")
        model_pgs = dataclasses.replace(model, solver_mode="pgs")
        mj = MJHostDynamics(model)
        cq = jnp.asarray(clip.qpos)
        cv = jnp.asarray(clip.qvel)

        def run(stepper, n=60):
            qp, qv = cq[0], cv[0]
            errs, hts = [], []
            for t in range(n):
                ref = cq[(t + 1) % len(clip)]
                ac = 0.8 * (ref[7:] - qp[7:])
                qp, qv = stepper(qp, qv, ac)
                errs.append(float(rewards.weighted_pose_error(
                    qp[7:], ref[7:])))
                hts.append(float(qp[2]))
            return np.array(errs), np.array(hts)

        steppers = {
            "apgd": jax.jit(lambda qp, qv, ac: engine.step(
                model, qp, qv, ac, n_substeps=2)),
            "pgs": jax.jit(lambda qp, qv, ac: engine.step(
                model_pgs, qp, qv, ac, n_substeps=2)),
            "mujoco": lambda qp, qv, ac: mj.step(qp, qv, ac, n_substeps=2),
        }
        out = {k: run(s) for k, s in steppers.items()}

        def fall_step(h):
            below = h < 0.4
            return int(np.argmax(below)) if below.any() else len(h)

        e_mj, h_mj = out["mujoco"]
        for name in ("apgd", "pgs"):
            e, h = out[name]
            assert np.abs(e - e_mj)[:20].mean() < 0.2, name
            assert np.abs(h - h_mj)[:20].mean() < 0.02, name
            assert abs(fall_step(h) - fall_step(h_mj)) <= 4, (
                name, fall_step(h), fall_step(h_mj))


class TestMuJoCoDivergenceBudget:
    """Quantitative contact-regime budget vs real MuJoCo (different solver:
    APGD vs PGS/Newton, so exactness is bounded by solver differences —
    beyond ~30 steps a falling trajectory is chaotic and only invariants
    are meaningful)."""

    def test_twenty_step_contact_budget(self):
        mujoco = pytest.importorskip("mujoco")
        import jax
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import build_humanoid, engine
        from deepmimic_mujoco_tpu.physics.mj_host import MJHostDynamics

        model = build_humanoid()
        mj = MJHostDynamics(model)
        qp = jnp.asarray(model.qpos0)
        qv = jnp.zeros(model.nv)
        qp_m, qv_m = np.asarray(qp), np.asarray(qv)
        rng = np.random.RandomState(0)
        ac = jnp.asarray(rng.uniform(-0.3, 0.3, 28), jnp.float32)
        step = jax.jit(lambda a, b: engine.step(model, a, b, ac))
        for _ in range(20):
            qp, qv = step(qp, qv)
            qp_m, qv_m = mj._host_step(qp_m, qv_m, np.asarray(ac), 1)
        assert float(np.abs(np.asarray(qp) - qp_m).max()) < 0.1
        assert abs(float(qp[2]) - qp_m[2]) < 0.02


class TestComVelocity:
    def test_matches_finite_difference(self):
        import jax
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import (build_humanoid, engine,
                                                  kinematics)

        model = build_humanoid()
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(model.qpos0).at[7:].add(
            0.2 * jax.random.normal(k1, (model.nv - 6,)))
        qvel = 0.5 * jax.random.normal(k2, (model.nv,))
        kin = kinematics.fk(model, qpos)
        v = kinematics.com_velocity(model, kin, qvel)
        h = 1e-4
        qpos2 = engine.integrate_pos(model, qpos, qvel, h)
        c1 = kinematics.mass_center(model, kinematics.fk(model, qpos))
        c2 = kinematics.mass_center(model, kinematics.fk(model, qpos2))
        v_fd = (c2 - c1) / h
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_fd),
                                   atol=5e-3)
