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
