"""Native (C++) mocap pipeline cross-validation vs the Python loader."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)

from deepmimic_mujoco_tpu.mocap import native
from deepmimic_mujoco_tpu.mocap.loader import convert_frames
from deepmimic_mujoco_tpu.mocap.registry import SKILLS, get_clip

from .conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


class TestNativeConversion:
    @pytest.mark.parametrize("skill", ["walk", "run", "backflip", "spinkick"])
    def test_matches_python_loader(self, skill):
        clip = get_clip(skill)
        qpos, qvel = native.convert_frames(clip.raw_frames)
        np.testing.assert_allclose(qpos, clip.qpos, atol=1e-12)
        np.testing.assert_allclose(qvel, clip.qvel, atol=1e-12)

    def test_all_skills(self):
        for skill in SKILLS:
            clip = get_clip(skill)
            qpos, qvel = native.convert_frames(clip.raw_frames)
            np.testing.assert_allclose(qpos, clip.qpos, atol=1e-12,
                                       err_msg=skill)
            np.testing.assert_allclose(qvel, clip.qvel, atol=1e-12,
                                       err_msg=skill)


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
class TestNativeParser:
    def test_parse_reference_clip(self):
        path = f"{REFERENCE_DIR}/src/mujoco/motions/humanoid3d_walk.txt"
        frames, loop = native.parse_clip(path)
        assert frames.shape == (39, 44)
        assert loop == "wrap"
        bundled = get_clip("walk")
        np.testing.assert_array_equal(frames, bundled.raw_frames)

    def test_full_native_ingestion(self):
        path = f"{REFERENCE_DIR}/src/mujoco/motions/humanoid3d_run.txt"
        clip = native.load_clip_native(path)
        bundled = get_clip("run")
        np.testing.assert_allclose(clip.qpos, bundled.qpos, atol=1e-12)
        np.testing.assert_allclose(clip.qvel, bundled.qvel, atol=1e-12)
        assert clip.loop == "none" or clip.loop == "wrap"
