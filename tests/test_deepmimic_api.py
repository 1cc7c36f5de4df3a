"""DeepMimic core-API facade tests (197-D state, PD set_action, builders)."""

import numpy as np
import pytest

from deepmimic_mujoco_tpu.envs.deepmimic_api import (
    ACTION_SIZE,
    STATE_SIZE,
    DeepMimicEnv,
)


@pytest.fixture(scope="module")
def env():
    return DeepMimicEnv(clip="walk")


class TestRecordState:
    def test_shape_and_no_nans(self, env):
        s = env.record_state(0)
        assert s.shape == (STATE_SIZE,)
        assert np.isfinite(s).all(), "state has unfilled NaN slots"

    def test_layout(self, env):
        s = env.record_state(0)
        assert s[0] == 0.0  # phase quirk
        # root-relative position of the root itself is zero
        np.testing.assert_allclose(s[2:5], 0.0, atol=1e-6)
        # root quat is unit
        assert np.linalg.norm(s[5:9]) == pytest.approx(1.0, abs=1e-5)

    def test_sizes(self, env):
        assert env.get_state_size() == 197
        assert env.get_action_size() == 36
        assert env.get_goal_size() == 0


class TestSetActionUpdate:
    def test_pd_action_drives_sim(self, env):
        env.reset()
        a = np.zeros(ACTION_SIZE)
        # spherical entries: angle 0, axis x → identity targets
        off = 0
        from deepmimic_mujoco_tpu.mocap.constants import (
            BODY_JOINTS_IN_DP_ORDER, DOF_DEF)
        for j in BODY_JOINTS_IN_DP_ORDER:
            if DOF_DEF[j] == 3:
                a[off + 1] = 1.0  # axis x
                off += 4
            else:
                off += 1
        env.set_action(0, a)
        q0 = np.asarray(env.qpos).copy()
        env.update(0.033)
        q1 = np.asarray(env.qpos)
        assert np.isfinite(q1).all()
        assert not np.allclose(q0, q1)

    def test_action2torque_zero_error_zero_p_term(self, env):
        """At the zero pose with zero targets, p_err = 0 → torque = −kd·qvel·…
        with qvel=0 → torque 0."""
        env.reset()
        a = np.zeros(ACTION_SIZE)
        off = 0
        from deepmimic_mujoco_tpu.mocap.constants import (
            BODY_JOINTS_IN_DP_ORDER, DOF_DEF)
        for j in BODY_JOINTS_IN_DP_ORDER:
            if DOF_DEF[j] == 3:
                a[off + 1] = 1.0
                off += 4
            else:
                off += 1
        tau = env.action2torque(a)
        np.testing.assert_allclose(tau, 0.0, atol=1e-4)


class TestBuilders:
    def test_normalization_builders(self, env):
        assert env.build_state_offset().shape == (197,)
        groups = env.build_state_norm_groups()
        assert groups[-1] == 1 and groups[0] == 0
        assert env.build_action_bound_min()[0] == -10
        assert env.check_terminate() == 2
        assert env.record_goal().tolist() == [1]
