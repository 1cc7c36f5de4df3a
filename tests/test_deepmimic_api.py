"""DeepMimic core-API facade tests (197-D state, PD set_action, builders)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)

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
        env.reset()
        s = env.record_state(0)
        assert s[0] == 0.0  # phase 0 at t=0
        # root-relative position of the root itself is zero
        np.testing.assert_allclose(s[2:5], 0.0, atol=1e-6)
        # root quat is unit
        assert np.linalg.norm(s[5:9]) == pytest.approx(1.0, abs=1e-5)

    def test_phase_advances_with_sim_time(self, env):
        env.reset()
        env.update(1.0 / 30.0)   # one mocap frame of sim time
        s = env.record_state(0)
        assert s[0] == pytest.approx(1.0 / len(env.mocap), abs=1e-6)

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
        assert env.record_goal().tolist() == [1]

    def test_substeps_from_controller_spec(self, env):
        # UpdateRate 30 (humanoid3d_ctrl.txt) at dt=0.0166 → 2 substeps,
        # not the reference's hardcoded 32
        assert env.get_num_update_substeps() == 2


class TestRewardAndTermination:
    def test_standing_not_terminated(self, env):
        env.reset()
        assert env.check_terminate() == 0

    def test_fall_contact_fails(self):
        import jax.numpy as jnp

        env2 = DeepMimicEnv(clip="walk")
        env2.reset()
        # chest-down near the floor → a disallowed body contacts
        env2.qpos = env2.qpos.at[2].set(0.2).at[3:7].set(
            jnp.asarray([0.7071, 0.0, 0.7071, 0.0]))
        for _ in range(12):
            env2.update(env2.model.dt)
        assert env2.check_terminate() == 1

    def test_imitation_reward_scores_cursor(self):
        import jax.numpy as jnp

        env2 = DeepMimicEnv(clip="walk", reward_mode="imitation")
        env2.reset()
        # place the character exactly on mocap frame 0 → near-perfect reward
        # (velocity from the integrator-consistent track the reward scores
        # against — MocapClip.qvel_fd; the quirk array zeroes frame 0)
        env2.qpos = jnp.asarray(env2.mocap.qpos[0], jnp.float32)
        env2.qvel = jnp.asarray(env2.mocap.qvel_fd[0], jnp.float32)
        r = env2.calc_reward()
        assert r > 0.9, r
        # stub mode keeps the reference's placeholder (random in [-0.5,0.5))
        env3 = DeepMimicEnv(clip="walk", reward_mode="stub")
        assert -0.5 <= env3.calc_reward() < 0.5
