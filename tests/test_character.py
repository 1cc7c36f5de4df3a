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
