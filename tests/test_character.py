"""DeepMimic character-JSON importer tests (guarded by reference data)."""

import os

import numpy as np
import pytest


from .conftest import REFERENCE_DIR, requires_reference

CHAR = os.path.join(REFERENCE_DIR, "src/data/characters/humanoid3d.txt")
CTRL = os.path.join(REFERENCE_DIR, "src/data/controllers/humanoid3d_ctrl.txt")


@requires_reference
class TestCharacterImport:
    @pytest.fixture(scope="class")
    def model(self):
        from deepmimic_mujoco_tpu.physics.deepmimic_character import load_character

        return load_character(CHAR, CTRL)

    def test_sizes_match_canonical(self, model):
        assert (model.nq, model.nv, model.nu) == (35, 34, 28)

    def test_total_mass(self, model):
        assert float(np.sum(np.asarray(model.body_mass))) == pytest.approx(45.0)

    def test_body_offsets_match_handbuilt(self, model):
        from deepmimic_mujoco_tpu.physics import build_humanoid

        ref = build_humanoid()
        for i, n in enumerate(model.body_names):
            j = ref.body_names.index(n)
            np.testing.assert_allclose(
                np.asarray(model.body_pos[i]), np.asarray(ref.body_pos[j]),
                atol=1e-6, err_msg=n)
            assert float(model.body_mass[i]) == pytest.approx(
                float(ref.body_mass[j]), abs=1e-6), n

    def test_gears_from_controller_file(self, model):
        from deepmimic_mujoco_tpu.physics import build_humanoid

        ref = build_humanoid()
        # both are ordered by the canonical joint order
        np.testing.assert_allclose(
            np.asarray(model.actuator_gear), np.asarray(ref.actuator_gear))

    def test_simulates(self, model):
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import engine

        qp, qv = engine.step(model, jnp.asarray(model.qpos0),
                             jnp.zeros(34, jnp.float32), jnp.zeros(28))
        assert np.isfinite(np.asarray(qp)).all()


class TestCharacterExportRoundTrip:
    """export_character → load_character must reproduce build_humanoid
    (no reference needed: assets are generated from the package tables)."""

    @pytest.fixture(scope="class")
    def roundtrip(self, tmp_path_factory):
        import json

        from deepmimic_mujoco_tpu.physics.deepmimic_character import (
            export_character, load_character)

        character, controller = export_character()
        d = tmp_path_factory.mktemp("char")
        cpath, kpath = d / "humanoid3d.json", d / "ctrl.json"
        cpath.write_text(json.dumps(character))
        kpath.write_text(json.dumps(controller))
        return load_character(str(cpath), str(kpath))

    def test_sizes(self, roundtrip):
        from deepmimic_mujoco_tpu.physics.humanoid import build_humanoid

        ref = build_humanoid()
        assert (roundtrip.nq, roundtrip.nv) == (ref.nq, ref.nv)

    def test_kinematics_and_gears_match(self, roundtrip):
        from deepmimic_mujoco_tpu.physics.humanoid import build_humanoid

        ref = build_humanoid()
        np.testing.assert_allclose(
            np.asarray(roundtrip.body_pos), np.asarray(ref.body_pos),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(roundtrip.actuator_gear),
            np.asarray(ref.actuator_gear))
        np.testing.assert_allclose(
            np.asarray(roundtrip.hinge_range), np.asarray(ref.hinge_range),
            atol=1e-6)

    def test_mass_matches(self, roundtrip):
        from deepmimic_mujoco_tpu.physics.humanoid import build_humanoid

        ref = build_humanoid()
        np.testing.assert_allclose(
            np.asarray(roundtrip.body_mass), np.asarray(ref.body_mass),
            atol=1e-6)

    def test_shipped_assets_load(self):
        """The generated assets under assets/ parse and simulate."""
        import jax.numpy as jnp

        from deepmimic_mujoco_tpu.physics import engine
        from deepmimic_mujoco_tpu.physics.deepmimic_character import (
            load_character)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cpath = os.path.join(repo, "assets/characters/humanoid3d.json")
        kpath = os.path.join(repo, "assets/controllers/humanoid3d_ctrl.json")
        if not os.path.exists(cpath):
            pytest.skip("generated assets absent (run tools/gen_assets.py)")
        model = load_character(cpath, kpath)
        qp, qv = engine.step(model, jnp.asarray(model.qpos0),
                             jnp.zeros(model.nv, jnp.float32),
                             jnp.zeros(model.nu, jnp.float32))
        assert np.isfinite(np.asarray(qp)).all()
