"""Mocap pipeline tests: loader invariants, scipy cross-validation, and
(guarded) parity against the reference's transformations.py behaviour."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)
from scipy.spatial.transform import Rotation as R

from deepmimic_mujoco_tpu.mocap import _quat_np as qnp
from deepmimic_mujoco_tpu.mocap.constants import NQ, NV
from deepmimic_mujoco_tpu.mocap.loader import convert_frames, load_deepmimic_json
from deepmimic_mujoco_tpu.mocap.registry import SKILLS, available_clips, get_clip

from .conftest import REFERENCE_DIR, requires_reference


class TestBundledClips:
    def test_all_15_skills_bundled(self):
        clips = available_clips()
        for s in SKILLS:
            assert f"humanoid3d_{s}" in clips, f"missing bundled clip {s}"

    def test_walk_clip_shapes(self):
        clip = get_clip("walk")
        assert clip.qpos.shape == (39, NQ)
        assert clip.qvel.shape == (39, NV)
        assert clip.loop == "wrap"
        assert clip.dt == pytest.approx(0.033332, abs=1e-6)

    def test_first_frame_velocity_zero(self):
        clip = get_clip("run")
        np.testing.assert_allclose(clip.qvel[0], 0.0)

    def test_root_quat_normalized(self):
        clip = get_clip("spinkick")
        # source data carries ~1e-6 normalization error which the reference
        # pipeline preserves (align_rotation is norm-preserving, no renorm)
        norms = np.linalg.norm(clip.qpos[:, 3:7], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_euler_roundtrips_to_aligned_quat(self):
        """data_config euler triplets must reconstruct the aligned joint quats
        (the whole point of the euler-rxyz hinge decomposition)."""
        clip = get_clip("walk")
        # chest occupies qpos[7:10] and quat_frames[8:12]
        for k in range(len(clip)):
            e = clip.qpos[k, 7:10]
            q_want = clip.quat_frames[k, 8:12]
            q_got = qnp.from_euler_rxyz(e)
            if np.dot(q_got, q_want) < 0:
                q_got = -q_got
            # euler extraction normalizes; source quats carry ~1e-6 norm error
            np.testing.assert_allclose(q_got, q_want, atol=1e-5)


class TestVelocitySemantics:
    def test_linear_velocity_forward_difference(self):
        clip = get_clip("walk")
        k = 5
        dura = clip.durations[k - 1]
        want = (clip.qpos[k, :3] - clip.qpos[k - 1, :3]) / dura
        np.testing.assert_allclose(clip.qvel[k, :3], want, atol=1e-12)

    def test_rot_vel_matches_scipy(self):
        """rot_vel(q0, q1, dt) == rotvec(R0^{-1} R1)/dt with wrapped angle."""
        rng = np.random.RandomState(3)
        for _ in range(50):
            q0, q1 = rng.randn(4), rng.randn(4)
            q0 /= np.linalg.norm(q0)
            q1 /= np.linalg.norm(q1)
            dt = 0.0333
            got = qnp.rot_vel(q0, q1, dt)
            r0 = R.from_quat(np.roll(q0, -1))
            r1 = R.from_quat(np.roll(q1, -1))
            want = (r0.inv() * r1).as_rotvec() / dt
            np.testing.assert_allclose(got, want, atol=1e-9)

    def test_angular_velocity_uses_reference_order(self):
        """qvel rotational parts use (curr, prev) order — the reference's
        quirk at mocap_v2.py:113/135 — i.e. the negative of prev→curr."""
        clip = get_clip("walk")
        k = 7
        dura = clip.durations[k - 1]
        q_curr = clip.quat_frames[k, 4:8]
        q_prev = clip.quat_frames[k - 1, 4:8]
        want = qnp.rot_vel(q_curr, q_prev, dura)
        np.testing.assert_allclose(clip.qvel[k, 3:6], want, atol=1e-12)


class TestAlignment:
    def test_align_rotation_is_x90_conjugation(self):
        rng = np.random.RandomState(0)
        x90 = R.from_rotvec([np.pi / 2, 0, 0])
        for _ in range(20):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            got = qnp.align_rotation(q)
            rq = R.from_quat(np.roll(q, -1))
            want = (x90 * rq * x90.inv()).as_quat()
            want = np.roll(want, 1)
            if np.dot(got, want) < 0:
                want = -want
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_align_position(self):
        np.testing.assert_allclose(
            qnp.align_position(np.array([1.0, 2.0, 3.0])), [1.0, -3.0, 2.0]
        )


@requires_reference
class TestReferenceParity:
    def test_euler_rxyz_matches_reference_transformations(self):
        sys.path.insert(0, os.path.join(REFERENCE_DIR, "src"))
        try:
            import transformations as tfm
        finally:
            sys.path.pop(0)
        rng = np.random.RandomState(11)
        for _ in range(300):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            got = qnp.euler_rxyz(q)
            want = np.array(
                tfm.euler_from_quaternion([q[1], q[2], q[3], q[0]], axes="rxyz")
            )
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_loader_reads_reference_clip_files(self):
        path = os.path.join(REFERENCE_DIR, "src/mujoco/motions/humanoid3d_walk.txt")
        clip = load_deepmimic_json(path)
        bundled = get_clip("walk")
        np.testing.assert_allclose(clip.qpos, bundled.qpos, atol=0)
        np.testing.assert_allclose(clip.qvel, bundled.qvel, atol=0)

    def test_raw_frames_match_reference_files(self):
        path = os.path.join(REFERENCE_DIR, "src/mujoco/motions/humanoid3d_run.txt")
        with open(path) as f:
            frames = np.asarray(json.load(f)["Frames"], dtype=np.float64)
        bundled = get_clip("run")
        np.testing.assert_array_equal(bundled.raw_frames, frames)


class TestLegacyV1Surface:
    """v1 MocapDM parity layer (mocap/legacy.py vs reference mocap_v1.py)."""

    def test_data_keeps_quaternions(self):
        from deepmimic_mujoco_tpu.mocap.legacy import MocapV1

        m = MocapV1()
        m.load_mocap("walk")
        assert m.data.shape[1] == 44   # dura + pos3 + quat4 + joints
        # root quats are unit
        n = np.linalg.norm(m.data[:, 4:8], axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
        assert len(m.all_states) == len(m.data)
        assert len(m.durations) == len(m.data)

    def test_data_angle_layout_quirk(self):
        """data_angle rows mix root pos(3) + root QUAT(4) + joint
        rpy/scalars (mocap_v1.py:118-151)."""
        from deepmimic_mujoco_tpu.mocap.constants import BODY_JOINTS, DOF_DEF
        from deepmimic_mujoco_tpu.mocap.legacy import MocapV1

        m = MocapV1()
        m.load_mocap("walk")
        expect = 3 + 4 + sum(3 if DOF_DEF[j] == 3 else 1
                             for j in BODY_JOINTS)
        assert len(m.data_angle[0]) == expect

    def test_quat2euler_roundtrip(self):
        """The hand-rolled rpy conversion inverts the standard xyz-extrinsic
        euler composition."""
        import math

        from deepmimic_mujoco_tpu.mocap.legacy import quat2euler

        phi, theta, psi = 0.3, -0.4, 0.9

        def q_axis(angle, axis):
            h = angle / 2.0
            return np.array([math.cos(h)] + [math.sin(h) * a for a in axis])

        def q_mul(a, b):
            w0, x0, y0, z0 = a
            w1, x1, y1, z1 = b
            return np.array([
                w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
                w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
                w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
                w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
            ])

        q = q_mul(q_mul(q_axis(psi, (0, 0, 1)), q_axis(theta, (0, 1, 0))),
                  q_axis(phi, (1, 0, 0)))
        np.testing.assert_allclose(quat2euler(q), [phi, theta, psi],
                                   atol=1e-8)

    def test_data_vel_matches_shared_pipeline(self):
        from deepmimic_mujoco_tpu.mocap.legacy import MocapV1
        from deepmimic_mujoco_tpu.mocap.registry import get_clip

        m = MocapV1()
        m.load_mocap("walk")
        clip = get_clip("walk")
        np.testing.assert_allclose(np.asarray(m.data_vel[1:]),
                                   np.asarray(clip.qvel)[1:], atol=1e-6)


class TestConsistentVelocities:
    """MocapClip.qvel_fd — the integrator-consistent velocity track that
    replaces the reference's negated-ω quirk arrays for training defaults
    (loader.consistent_qvel)."""

    def test_roundtrip_through_integrate_pos(self):
        """integrate_pos(qpos_cont[k], qvel_fd[k], dur[k]) == qpos_cont[k+1]
        (up to quaternion float error) — the defining property.  qvel_fd is
        defined on the CONTINUOUS track (branch flips removed), not the raw
        extraction."""
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.mocap.registry import get_clip
        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        model = build_humanoid()
        for name in ("walk", "spinkick"):
            clip = get_clip(name)
            qv = clip.qvel_fd
            assert np.isfinite(qv).all()
            for k in (0, len(clip) // 2, len(clip) - 2):
                d = float(clip.durations[k]) or clip.dt
                nxt = np.asarray(engine.integrate_pos(
                    model, jnp.asarray(clip.qpos_cont[k], jnp.float64),
                    jnp.asarray(qv[k], jnp.float64), d))
                tgt = clip.qpos_cont[k + 1]
                # position + hinges exact; quaternion up to sign
                np.testing.assert_allclose(nxt[:3], tgt[:3], atol=1e-6)
                np.testing.assert_allclose(nxt[7:], tgt[7:], atol=1e-6)
                qd = min(np.abs(nxt[3:7] - tgt[3:7]).max(),
                         np.abs(nxt[3:7] + tgt[3:7]).max())
                assert qd < 1e-6, (name, k, qd)

    def test_wrap_clip_closes_cycle(self):
        """Looping clip: the last frame's velocity heads to frame 0 (with the
        ground-plane cycle offset), not to garbage."""
        from deepmimic_mujoco_tpu.mocap.registry import get_clip

        clip = get_clip("walk")
        assert clip.loop == "wrap"
        qv = clip.qvel_fd
        d = float(clip.durations[-1]) or clip.dt
        off = clip.qpos[-1, 0:3] - clip.qpos[0, 0:3]
        off[2] = 0.0
        expect = (clip.qpos[0, 0:3] + off - clip.qpos[-1, 0:3]) / d
        np.testing.assert_allclose(qv[-1, 0:3], expect, atol=1e-9)

    def test_reference_quirk_array_unchanged(self):
        """The parity array (clip.qvel) keeps the reference's semantics —
        qvel_fd is an ADDITIONAL track, not a rewrite."""
        from deepmimic_mujoco_tpu.mocap.registry import get_clip

        clip = get_clip("spinkick")
        # the quirk array differs from the consistent one on a fast clip
        assert np.abs(np.asarray(clip.qvel)[1:-1]
                      - clip.qvel_fd[1:-1]).max() > 1.0
        # and frame 0 keeps the reference's vel≡0 quirk
        np.testing.assert_allclose(np.asarray(clip.qvel)[0, :6], 0.0)

    def test_env_velocity_selection(self):
        """DPEnvV3 defaults to consistent velocities; 'reference' opts back
        into the quirk arrays."""
        from deepmimic_mujoco_tpu.envs.dp_env_v3 import DPEnvV3

        e_new = DPEnvV3(clip="spinkick", reward_mode="imitation_dm",
                        control_mode="pd_residual", n_substeps=2)
        e_ref = DPEnvV3(clip="spinkick", reward_mode="imitation_dm",
                        control_mode="pd_residual", n_substeps=2,
                        clip_velocities="reference")
        clip = e_new.clip
        np.testing.assert_allclose(np.asarray(e_new.clip_qvel),
                                   clip.qvel_fd.astype(np.float32))
        np.testing.assert_allclose(np.asarray(e_ref.clip_qvel),
                                   np.asarray(clip.qvel).astype(np.float32))


class TestFixedTrackRegression:
    """Regression pin for the round-4 imitation-ceiling root cause: the
    corrected tracks (``qpos_cont`` euler continuity + ``qvel_fd``
    integrator-consistent velocities) must stay finite and physically
    bounded for EVERY bundled clip.  Before the fix, per-frame quat→euler
    branch flips spiked finite-difference rates to 178 rad/s and fed the
    iter-0 ``non-finite meankl`` abort on dance_a (chainlog/imit15.log,
    round 4); the r5 vmapped 15-lane run trains all clips finite on the
    fixed tracks."""

    # rad/s: the fixed tracks peak at 87.7 (getup_facedown's fast
    # transition frames); the pre-fix euler-branch defect spiked to 178.
    # 120 separates real clip dynamics from branch-flip artifacts.
    MAX_RATE = 120.0

    @pytest.mark.parametrize("name", sorted(SKILLS))
    def test_tracks_finite_and_bounded(self, name):
        clip = get_clip(name)
        cont = clip.qpos_cont
        vel = clip.qvel_fd
        assert np.isfinite(cont).all() and np.isfinite(vel).all()
        # continuity: no euler-branch jumps between consecutive frames
        djoint = np.abs(np.diff(cont[:, 7:], axis=0)).max()
        assert djoint < np.pi, f"{name}: branch flip (d={djoint:.2f} rad)"
        # FD velocities bounded by human-motion rates (pre-fix: 178 rad/s)
        assert np.abs(vel[:, 6:]).max() < self.MAX_RATE, (
            f"{name}: joint rate {np.abs(vel[:, 6:]).max():.1f} rad/s")
        assert np.abs(vel[:, :3]).max() < 10.0  # root m/s
