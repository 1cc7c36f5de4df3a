"""MJCF importer tests: round-trip through our exporter and parity with the
programmatic humanoid."""

import numpy as np
import pytest


import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics import build_humanoid
from deepmimic_mujoco_tpu.physics.humanoid import to_mjcf
from deepmimic_mujoco_tpu.physics.mjcf import parse_mjcf


class TestMJCFRoundTrip:
    def test_parse_exported_humanoid_matches_builder(self):
        model_py = build_humanoid()
        model_xml = parse_mjcf(to_mjcf(), contact_cap=16, limit_cap=16)
        assert model_xml.nq == model_py.nq
        assert model_xml.nv == model_py.nv
        assert model_xml.nu == model_py.nu
        assert model_xml.body_names == model_py.body_names
        assert model_xml.parent == model_py.parent
        np.testing.assert_allclose(
            np.asarray(model_xml.body_mass), np.asarray(model_py.body_mass),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model_xml.body_pos), np.asarray(model_py.body_pos),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model_xml.hinge_range), np.asarray(model_py.hinge_range),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model_xml.actuator_gear),
            np.asarray(model_py.actuator_gear), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model_xml.qpos0), np.asarray(model_py.qpos0), atol=1e-6)
        assert model_xml.dt == pytest.approx(model_py.dt)
        assert model_xml.integrator == model_py.integrator

    def test_visual_export_is_render_only(self):
        # visual=True adds the checker-ground texture + headlight (the
        # TPU-native stand-in for the reference's GL grid0.png /
        # Lighting_Lambert shaders); it must not change the dynamical model
        # our parser extracts, and must remain loadable by host MuJoCo.
        plain = parse_mjcf(to_mjcf(), contact_cap=16, limit_cap=16)
        deco = parse_mjcf(to_mjcf(visual=True), contact_cap=16, limit_cap=16)
        assert deco.body_names == plain.body_names
        np.testing.assert_allclose(
            np.asarray(deco.body_mass), np.asarray(plain.body_mass), atol=0)
        np.testing.assert_allclose(
            np.asarray(deco.qpos0), np.asarray(plain.qpos0), atol=0)
        xml = to_mjcf(visual=True)
        assert 'builtin="checker"' in xml and 'material="grid_mat"' in xml
        mujoco = pytest.importorskip("mujoco")
        m = mujoco.MjModel.from_xml_string(xml)
        assert m.ntex == 1 and m.nmat == 1

    def test_same_dynamics(self):
        from deepmimic_mujoco_tpu.physics import engine

        m1 = build_humanoid()
        m2 = parse_mjcf(to_mjcf(), contact_cap=16, limit_cap=16)
        qp = jnp.asarray(m1.qpos0)
        qv = jnp.zeros(34, jnp.float32)
        a1 = engine.forward(m1, qp, qv, jnp.zeros(28)).qacc
        a2 = engine.forward(m2, qp, qv, jnp.zeros(28)).qacc
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    def test_minimal_pendulum(self):
        xml = """
        <mujoco>
          <option timestep="0.01" integrator="Euler"/>
          <worldbody>
            <body name="base" pos="0 0 1">
              <joint type="free"/>
              <geom name="ball" type="sphere" size="0.1" mass="2"/>
              <body name="arm" pos="0 0 -0.2">
                <joint name="swing" axis="0 1 0" range="-1 1" type="hinge"/>
                <geom name="rod" type="capsule" size="0.02"
                      fromto="0 0 0 0 0 -0.3" mass="0.5"/>
              </body>
            </body>
          </worldbody>
          <actuator><motor joint="swing" gear="10"/></actuator>
        </mujoco>"""
        m = parse_mjcf(xml)
        assert m.nq == 8 and m.nv == 7 and m.nu == 1
        assert m.integrator == "euler"
        assert m.dt == pytest.approx(0.01)
        assert float(np.sum(np.asarray(m.body_mass))) == pytest.approx(2.5)

    def test_unsupported_joint_raises(self):
        xml = """
        <mujoco><worldbody><body name="b">
          <joint type="ball"/>
          <geom type="sphere" size="0.1" mass="1"/>
        </body></worldbody></mujoco>"""
        with pytest.raises(ValueError, match="unsupported joint type"):
            parse_mjcf(xml)


@pytest.mark.fast
class TestMJCFReviewFixes:
    def test_root_quat_into_qpos0(self):
        from deepmimic_mujoco_tpu.physics.mjcf import parse_mjcf

        xml = """<mujoco><worldbody>
          <body name="root" pos="0 0 1" quat="0.7071068 0 0.7071068 0">
            <joint type="free"/>
            <geom type="sphere" size="0.1" mass="1"/>
          </body></worldbody></mujoco>"""
        m = parse_mjcf(xml)
        np.testing.assert_allclose(
            np.asarray(m.qpos0[3:7]), [0.7071068, 0, 0.7071068, 0],
            atol=1e-6)

    def test_nonorigin_hinge_pos_rejected(self):
        from deepmimic_mujoco_tpu.physics.mjcf import parse_mjcf

        xml = """<mujoco><worldbody>
          <body name="root" pos="0 0 1">
            <joint type="free"/>
            <geom type="sphere" size="0.1" mass="1"/>
            <body name="arm" pos="0 0 -0.2">
              <joint name="j" type="hinge" pos="0 0.1 0" axis="0 1 0"/>
              <geom type="sphere" size="0.05" mass="0.2"/>
            </body>
          </body></worldbody></mujoco>"""
        with pytest.raises(ValueError, match="non-origin pos"):
            parse_mjcf(xml)


@pytest.mark.fast
class TestV1BallVariant:
    """Ball-joint v1 model variant (SURVEY §2.5; reference
    asset/dp_env_v1.xml): same bodies/geoms/gears as the hinge model,
    3-DOF joints as MuJoCo balls, v1 option block."""

    def test_compiles_with_v1_layout(self):
        import mujoco

        from deepmimic_mujoco_tpu.physics.humanoid import to_mjcf_v1_ball

        m = mujoco.MjModel.from_xml_string(to_mjcf_v1_ball())
        assert (m.nq, m.nv, m.nu) == (43, 34, 28)  # = reference dp_env_v1
        assert m.opt.timestep == pytest.approx(0.002)
        # 8 ball + 4 hinge + free root, like the reference v1 model
        import collections
        kinds = collections.Counter(int(t) for t in m.jnt_type)
        assert kinds[int(mujoco.mjtJoint.mjJNT_BALL)] == 8
        assert kinds[int(mujoco.mjtJoint.mjJNT_HINGE)] == 4
        assert kinds[int(mujoco.mjtJoint.mjJNT_FREE)] == 1

    def test_fk_matches_hinge_model(self):
        """Mapping euler triples -> ball quats gives identical body FK."""
        import mujoco
        import numpy as np

        from deepmimic_mujoco_tpu.mocap.registry import get_clip
        from deepmimic_mujoco_tpu.physics.humanoid import (
            to_mjcf, to_mjcf_v1_ball)

        mh = mujoco.MjModel.from_xml_string(to_mjcf())
        mb = mujoco.MjModel.from_xml_string(to_mjcf_v1_ball())
        dh, db = mujoco.MjData(mh), mujoco.MjData(mb)
        clip = get_clip("walk")
        for fi in (0, 10, 25):
            frame = np.asarray(clip.qpos[fi], float)
            dh.qpos[:] = frame
            # ball layout: root 7, then per-joint quat/hinge in same order
            qb = [frame[:7]]
            off = 7
            for j in range(1, mb.njnt):
                if mb.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
                    e = frame[off:off + 3]
                    q = np.zeros(4)
                    for ang, ax in zip(e, np.eye(3)):
                        r = np.concatenate([[np.cos(ang / 2)],
                                            np.sin(ang / 2) * ax])
                        q2 = np.zeros(4)
                        mujoco.mju_mulQuat(q2, q if np.any(q) else
                                           np.array([1.0, 0, 0, 0]), r)
                        q = q2
                    qb.append(q)
                    off += 3
                else:
                    qb.append(frame[off:off + 1])
                    off += 1
            db.qpos[:] = np.concatenate(qb)
            mujoco.mj_kinematics(mh, dh)
            mujoco.mj_kinematics(mb, db)
            np.testing.assert_allclose(dh.xpos, db.xpos, atol=1e-9)
