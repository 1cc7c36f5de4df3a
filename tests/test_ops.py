"""Pallas kernel tests (interpret mode on CPU; numerics vs the XLA scan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.ops import apgd


def _random_problem(rng, B, nc, nl):
    ne = nc * 3 + nl
    # SPD A with regularization
    M = rng.randn(B, ne, ne)
    A = np.einsum("bij,bkj->bik", M, M) / ne + 0.5 * np.eye(ne)
    b = rng.randn(B, ne)
    mu = np.full((B, nc), 1.0)
    return (jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(mu, jnp.float32))


class TestAPGD:
    def test_pallas_interpret_matches_scan(self):
        rng = np.random.RandomState(0)
        nc, nl, B = 4, 5, 8
        A, b, mu = _random_problem(rng, B, nc, nl)
        scan_out = jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=60,
                                               nc=nc, nl=nl))(A, b, mu)
        # apgd_solve's contract is the GROUPED [fn|ft1|ft2|lim] layout;
        # permute interleaved inputs in and the solution back out.
        perm, inv = apgd._group_perm(nc, nl)
        pallas_out = apgd.apgd_solve(
            A[:, perm][:, :, perm], b[:, perm], mu, jnp.zeros_like(b),
            iterations=60, nc=nc, nl=nl, block=4, interpret=True)[:, inv]
        np.testing.assert_allclose(
            np.asarray(pallas_out), np.asarray(scan_out), atol=1e-4)

    def test_custom_vmap_dispatch_fallback(self):
        """With use_pallas=False the custom-vmap rule runs the scan batch."""
        rng = np.random.RandomState(1)
        nc, nl, B = 3, 2, 5
        A, b, mu = _random_problem(rng, B, nc, nl)
        fn = apgd.make_apgd(40, nc, nl, use_pallas=False)
        out_v = jax.vmap(fn)(A, b, mu, jnp.zeros_like(b))
        out_s = jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=40,
                                               nc=nc, nl=nl))(A, b, mu)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_s),
                                   atol=1e-6)

    def test_custom_vmap_pallas_interpret_with_padding(self):
        """Pallas dispatch pads B=5 → block 4 multiple and slices back."""
        rng = np.random.RandomState(2)
        nc, nl, B = 3, 2, 5
        A, b, mu = _random_problem(rng, B, nc, nl)
        fn = apgd.make_apgd(40, nc, nl, use_pallas=True, block=4,
                            interpret=True)
        out = jax.vmap(fn)(A, b, mu, jnp.zeros_like(b))
        ref = jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=40,
                                               nc=nc, nl=nl))(A, b, mu)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_lanes_kernel_matches_scan(self):
        """The lane-major kernel (env batch in the 128-lane axis) computes
        the same iterates as the per-env scan."""
        rng = np.random.RandomState(4)
        nc, nl, B = 4, 5, 8
        A, b, mu = _random_problem(rng, B, nc, nl)
        scan_out = jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=60,
                                               nc=nc, nl=nl))(A, b, mu)
        perm, inv = apgd._group_perm(nc, nl)
        Ag = A[:, perm][:, :, perm]
        out = apgd.apgd_solve_lanes(
            jnp.transpose(Ag, (1, 2, 0)), b[:, perm].T, mu.T,
            jnp.zeros_like(b).T,
            iterations=60, nc=nc, nl=nl, block=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.T[:, inv]),
                                   np.asarray(scan_out), atol=1e-4)

    def test_lanes_dispatch_with_padding(self):
        """make_apgd layout='lanes' pads B to the block multiple, transposes
        to lane-major and recovers the interleaved layout."""
        rng = np.random.RandomState(5)
        nc, nl, B = 3, 2, 5
        A, b, mu = _random_problem(rng, B, nc, nl)
        fn = apgd.make_apgd(40, nc, nl, use_pallas=True, block=4,
                            interpret=True, layout="lanes")
        out = jax.vmap(fn)(A, b, mu, jnp.zeros_like(b))
        ref = jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=40,
                                               nc=nc, nl=nl))(A, b, mu)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_solution_satisfies_cone(self):
        rng = np.random.RandomState(3)
        nc, nl, B = 4, 3, 4
        A, b, mu = _random_problem(rng, B, nc, nl)
        out = np.asarray(jax.vmap(
            lambda a_, b_, m_: apgd._apgd_scan(a_, b_, m_, jnp.zeros_like(b_), iterations=100,
                                               nc=nc, nl=nl))(A, b, mu))
        fc = out[:, : nc * 3].reshape(B, nc, 3)
        fn_ = fc[..., 0]
        ft = np.linalg.norm(fc[..., 1:], axis=-1)
        assert (fn_ >= -1e-6).all()
        assert (ft <= fn_ * 1.0 + 1e-4).all()
        assert (out[:, nc * 3:] >= -1e-6).all()

    def test_warm_start_accelerates_convergence(self):
        """A warm start from a near-solution reaches the converged answer in
        far fewer iterations than a cold start — the property the integrator
        exploits across RK4 stages (PhysicsModel.warm_iterations)."""
        rng = np.random.RandomState(6)
        nc, nl = 4, 5
        A, b, mu = _random_problem(rng, 1, nc, nl)
        a_, b_, m_ = A[0], b[0], mu[0]
        zeros = jnp.zeros_like(b_)
        truth = apgd._apgd_scan(a_, b_, m_, zeros, iterations=400,
                                nc=nc, nl=nl)
        cold10 = apgd._apgd_scan(a_, b_, m_, zeros, iterations=10,
                                 nc=nc, nl=nl)
        warm10 = apgd._apgd_scan(a_, b_, m_, truth + 0.01, iterations=10,
                                 nc=nc, nl=nl)
        err_cold = float(jnp.max(jnp.abs(cold10 - truth)))
        err_warm = float(jnp.max(jnp.abs(warm10 - truth)))
        assert err_warm < 0.2 * err_cold, (err_warm, err_cold)
        # warm start from the exact solution is a fixed point (within fp)
        warm0 = apgd._apgd_scan(a_, b_, m_, truth, iterations=5,
                                nc=nc, nl=nl)
        np.testing.assert_allclose(np.asarray(warm0), np.asarray(truth),
                                   atol=1e-3)


class TestWarmIntegration:
    def test_warm_step_matches_cold_closely(self):
        """engine.step with warm_iterations=25 stays within a tight budget
        of the cold-50 default over a contact-rich tracking rollout (full
        study: tools/warmstart_study.py — warm-25 diverges 0.0019 rad RMS
        from a 300-iteration truth over 40 steps, vs cold-50's 0.0007)."""
        import dataclasses

        import jax

        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.physics import build_humanoid

        base = build_humanoid(warm_iterations=0, solver_dtype="f32")
        warm = dataclasses.replace(base, warm_iterations=25)
        qs = {}
        for name, model in (("cold", base), ("warm", warm)):
            env = DPEnvV3(clip="walk", model=model, n_substeps=1)
            s0 = env.reset_at(jax.random.PRNGKey(0), 0)
            step = jax.jit(env.step)
            st = s0
            traj = []
            for t in range(12):
                ref = env.clip_qpos[(t + 1) % env.clip_len][7:]
                st = step(st, 0.8 * (ref - st.qpos[7:]))
                traj.append(np.asarray(st.qpos))
            qs[name] = np.stack(traj)
        rms = float(np.sqrt(np.mean((qs["cold"] - qs["warm"]) ** 2)))
        assert rms < 5e-3, rms

    def test_bf16_dual_matrix_close_to_f32(self):
        """solver_dtype='bf16' (A stored half-width for the APGD matvec
        streaming) perturbs the solve ~0.4% — trajectories stay within a
        tight budget of the f32 default."""
        import dataclasses

        import jax

        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.physics import build_humanoid

        base = build_humanoid(warm_iterations=0, solver_dtype="f32")
        bf16 = dataclasses.replace(base, solver_dtype="bf16")
        qs = {}
        for name, model in (("f32", base), ("bf16", bf16)):
            env = DPEnvV3(clip="walk", model=model, n_substeps=1)
            st = env.reset_at(jax.random.PRNGKey(0), 0)
            step = jax.jit(env.step)
            traj = []
            for t in range(12):
                ref = env.clip_qpos[(t + 1) % env.clip_len][7:]
                st = step(st, 0.8 * (ref - st.qpos[7:]))
                traj.append(np.asarray(st.qpos))
            qs[name] = np.stack(traj)
        rms = float(np.sqrt(np.mean((qs["f32"] - qs["bf16"]) ** 2)))
        assert rms < 5e-3, rms

    def test_stage_frozen_within_budget(self):
        """The r4 production default (stage_reuse='kin': FK/M⁻¹/contacts/
        dual matrix frozen across RK4 stages, stages 2-4 warm-solved at 8
        iterations, stage-1 at 15) stays within its measured budget of the
        exact-cold config over a contact-rich tracking rollout (full study:
        tools/warmstart_study.py — stage_kin rows diverge 0.018-0.028 rad
        RMS from a 300-iteration truth over 40 steps, an order of magnitude
        inside the model-level MuJoCo divergence the behavioural contract
        budgets)."""
        import dataclasses

        import jax

        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.physics import build_humanoid

        base = build_humanoid(warm_iterations=0, solver_dtype="f32",
                              stage_reuse="none", stage_iterations=0)
        froz = dataclasses.replace(base, warm_iterations=15,
                                   stage_reuse="kin", stage_iterations=8)
        qs = {}
        for name, model in (("exact", base), ("frozen", froz)):
            env = DPEnvV3(clip="walk", model=model, n_substeps=1)
            st = env.reset_at(jax.random.PRNGKey(0), 0)
            step = jax.jit(env.step)
            traj = []
            for t in range(12):
                ref = env.clip_qpos[(t + 1) % env.clip_len][7:]
                st = step(st, 0.8 * (ref - st.qpos[7:]))
                traj.append(np.asarray(st.qpos))
            qs[name] = np.stack(traj)
        rms = float(np.sqrt(np.mean((qs["exact"] - qs["frozen"]) ** 2)))
        assert rms < 2e-2, rms

    def test_stage_frozen_stage1_exact(self):
        """With stage_iterations=0 and warm_iterations=0 the frozen path's
        FIRST RK4 stage evaluates at the substep entry state — identical
        inputs to the legacy stage 1 — so a single-stage comparison (one
        Euler-style check is not available; instead compare one full step
        at a 300-iteration near-converged budget where the stage-2-4
        perturbation is the only difference) stays small."""
        import dataclasses

        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        base = build_humanoid(warm_iterations=0, solver_dtype="f32",
                              stage_reuse="none", iterations=300)
        froz = dataclasses.replace(base, stage_reuse="kin")
        qp0 = base.qpos0
        qv0 = jnp.zeros(base.nv)
        ctrl = jnp.zeros(base.nu)
        qp_a, qv_a = engine.step(base, qp0, qv0, ctrl)
        qp_b, qv_b = engine.step(froz, qp0, qv0, ctrl)
        # standing start, one dt: stage deltas are tiny → paths agree tightly
        assert float(jnp.max(jnp.abs(qp_a - qp_b))) < 1e-4
        assert float(jnp.max(jnp.abs(qv_a - qv_b))) < 1e-3

    def test_scan_accepts_bf16_a(self):
        """_apgd_scan on a bf16-stored A converges to the f32 solution
        within the storage-perturbation budget."""
        rng = np.random.RandomState(7)
        nc, nl = 4, 5
        A, b, mu = _random_problem(rng, 1, nc, nl)
        z = jnp.zeros_like(b[0])
        f32 = apgd._apgd_scan(A[0], b[0], mu[0], z, iterations=120,
                              nc=nc, nl=nl)
        bf16 = apgd._apgd_scan(A[0].astype(jnp.bfloat16), b[0], mu[0], z,
                               iterations=120, nc=nc, nl=nl)
        assert bf16.dtype == jnp.float32
        err = float(jnp.max(jnp.abs(bf16 - f32)))
        scale = float(jnp.max(jnp.abs(f32))) + 1e-6
        assert err < 0.03 * scale, (err, scale)


class TestPDTargetSchedule:
    """engine.step_pd with a (n_substeps, nu_joints) per-substep target
    schedule (the imitation envs' moving feed-forward)."""

    def test_schedule_matches_manual_substeps(self):
        from deepmimic_mujoco_tpu.mocap.constants import kp_kd_vectors
        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = build_humanoid()
        kp, kd = kp_kd_vectors()
        kp = jnp.asarray(kp, jnp.float32)
        kd = jnp.asarray(kd, jnp.float32)
        qp, qv = model.qpos0, jnp.zeros(model.nv)
        t0 = qp[7:]
        t1 = t0 + 0.05
        sched = jnp.stack([t0, t1])
        # scheduled 2-substep call == two single-substep calls
        qp_a, qv_a = engine.step_pd(model, qp, qv, sched, kp, kd,
                                    n_substeps=2)
        qp_m, qv_m = engine.step_pd(model, qp, qv, t0, kp, kd, n_substeps=1)
        qp_m, qv_m = engine.step_pd(model, qp_m, qv_m, t1, kp, kd,
                                    n_substeps=1)
        np.testing.assert_allclose(np.asarray(qp_a), np.asarray(qp_m),
                                   rtol=0, atol=2e-5)
        # and a held target stays the legacy path
        qp_h, _ = engine.step_pd(model, qp, qv, t0, kp, kd, n_substeps=2)
        assert np.abs(np.asarray(qp_h) - np.asarray(qp_a)).max() > 1e-6
