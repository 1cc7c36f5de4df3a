"""Environment layer tests: shapes, reference semantics, vectorization."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnvV1, DPEnvV2, DPEnvV3, VectorEnv
from deepmimic_mujoco_tpu.envs import rewards
from deepmimic_mujoco_tpu.mocap.registry import get_clip


@pytest.fixture(scope="module")
def env_v3():
    return DPEnvV3(clip="walk")


@pytest.fixture(scope="module")
def stepped(env_v3):
    step = jax.jit(env_v3.step)
    state = env_v3.reset(jax.random.PRNGKey(0))
    state = step(state, jnp.zeros(28))
    return state


class TestDPEnvV3:
    def test_reset_rsi_sets_mocap_frame(self, env_v3):
        state = env_v3.reset(jax.random.PRNGKey(3))
        idx = int(state.init_idx)
        assert 0 <= idx < env_v3.clip_len
        np.testing.assert_allclose(
            np.asarray(state.qpos), np.asarray(env_v3.clip_qpos[idx])
        )
        np.testing.assert_allclose(
            np.asarray(state.qvel), np.asarray(env_v3.clip_qvel[idx])
        )

    def test_reset_init_noise_bounds(self, env_v3):
        state = env_v3.reset_init(jax.random.PRNGKey(1))
        d = np.abs(np.asarray(state.qpos) - np.asarray(env_v3.model.qpos0))
        assert d.max() <= 0.01 + 1e-6
        assert np.abs(np.asarray(state.qvel)).max() <= 0.01 + 1e-6

    def test_obs_is_56d_root_excluded(self, stepped):
        assert stepped.obs.shape == (56,)
        np.testing.assert_allclose(
            np.asarray(stepped.obs),
            np.concatenate([np.asarray(stepped.qpos[7:]), np.asarray(stepped.qvel[6:])]),
        )

    def test_alive_reward_is_one(self, stepped):
        assert float(stepped.reward) == 1.0

    def test_not_done_at_mocap_frames(self, env_v3):
        # CoM height of every walk frame is inside (0.7, 2.0) → alive
        step = jax.jit(env_v3.step)
        state = env_v3.reset_at(jax.random.PRNGKey(0), 0)
        state = step(state, jnp.zeros(28))
        assert not bool(state.done)

    def test_mocap_reward_mode_advances_cursor(self):
        env = DPEnvV3(clip="walk", reward_mode="mocap")
        step = jax.jit(env.step)
        state = env.reset_at(jax.random.PRNGKey(0), 5)
        s1 = step(state, jnp.zeros(28))
        assert int(s1.mocap_idx) == 6
        assert 0.0 < float(s1.reward) <= 1.0

    def test_imitation_reward_in_range(self):
        env = DPEnvV3(clip="walk", reward_mode="imitation")
        step = jax.jit(env.step)
        state = env.reset_at(jax.random.PRNGKey(0), 0)
        s1 = step(state, jnp.zeros(28))
        assert 0.0 < float(s1.reward) <= 1.0
        # at the exact reference frame with matching velocity the reward
        # should be near its maximum Σweights = 1.0
        r = rewards.imitation_reward(
            env.clip_qpos[3][7:], env.clip_qpos[3][7:],
            env.clip_qvel[3], env.clip_qvel[3],
            env.clip_qpos[3][0:3], env.clip_qpos[3][0:3],
            ee_pos=env.clip_ee[3], ref_ee_pos=env.clip_ee[3],
            com=env.clip_com[3], ref_com=env.clip_com[3],
        )
        assert float(r) == pytest.approx(1.0, abs=1e-5)


class TestDPEnvV2:
    def test_obs_67d(self):
        env = DPEnvV2(clip="walk")
        state = env.reset(jax.random.PRNGKey(0))
        assert state.obs.shape == (67,)

    def test_reward_at_reference_pose(self):
        env = DPEnvV2(clip="walk")
        step = jax.jit(env.step)
        state = env.reset(jax.random.PRNGKey(0))
        s1 = step(state, jnp.zeros(28))
        # exp(-2 err) - 0.1*0 ∈ (0, 1]
        assert 0.0 < float(s1.reward) <= 1.0
        assert int(s1.mocap_idx) == 1


class TestDPEnvV1:
    def test_reward_components(self):
        env = DPEnvV1(clip="walk")
        step = jax.jit(env.step)
        state = env.reset(jax.random.PRNGKey(0))
        assert state.obs.shape == (67,)
        s1 = step(state, jnp.zeros(28))
        assert np.isfinite(float(s1.reward))

    def test_update_interval_gating(self):
        env = DPEnvV1(clip="walk")
        # mocap dt 0.0333 / control dt 0.012 → interval 2
        assert env.update_interval == int(env.mocap_dt // (env.model.dt * env.n_substeps))


class TestVectorEnv:
    def test_batched_rollout_with_autoreset(self):
        env = DPEnvV3(clip="walk")
        venv = VectorEnv(env, num_envs=8)
        state = venv.reset(jax.random.PRNGKey(0))
        assert state.obs.shape == (8, 56)
        for _ in range(3):
            state = venv.step(state, jnp.zeros((8, 28)))
        assert state.obs.shape == (8, 56)
        assert np.isfinite(np.asarray(state.obs)).all()

    def test_done_envs_are_reset_to_init(self):
        env = DPEnvV3(clip="walk")
        venv = VectorEnv(env, num_envs=4, autoreset="init")
        state = venv.reset(jax.random.PRNGKey(0))
        # force "done" by injecting a fallen state: root far below ground
        qpos = np.array(state.qpos)  # writable copy
        qpos[:, 2] = 0.1
        state = jax.tree.map(lambda x: x, state)
        state = state.__class__(
            qpos=jnp.asarray(qpos), qvel=state.qvel, obs=state.obs,
            reward=state.reward, done=state.done, mocap_idx=state.mocap_idx,
            init_idx=state.init_idx, step_count=state.step_count, key=state.key,
        )
        nxt = venv.step(state, jnp.zeros((4, 28)))
        assert bool(np.all(np.asarray(nxt.done)))
        # after autoreset the qpos should be near standing qpos0
        d = np.abs(np.asarray(nxt.qpos) - np.asarray(env.model.qpos0))
        assert d.max() <= 0.011


class TestScanRollout:
    def test_scan_rollout_compiles_once(self):
        env = DPEnvV3(clip="walk")
        venv = VectorEnv(env, num_envs=4)

        @jax.jit
        def rollout(key):
            state = venv.reset(key)

            def body(s, _):
                s2 = venv.step(s, jnp.zeros((4, 28)))
                return s2, (s2.reward, s2.done)

            state, (rews, dones) = jax.lax.scan(body, state, None, length=5)
            return rews, dones

        rews, dones = rollout(jax.random.PRNGKey(0))
        assert rews.shape == (5, 4)
        np.testing.assert_allclose(np.asarray(rews), 1.0)


class TestPDControlAndImitation:
    """PD control mode (engine.step_pd), phase observation, time cap."""

    def test_pd_obs_has_phase(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="walk", reward_mode="imitation",
                      control_mode="pd", n_substeps=2)
        # imitation defaults to the root-aware 'full' obs: phase (1) +
        # root_obs (11) + qpos[7:]/qvel[6:] (56)
        assert env.observation_size == 68
        s = env.reset_at(jax.random.PRNGKey(0), 5)
        assert s.obs.shape == (68,)
        np.testing.assert_allclose(float(s.obs[0]), 5 / env.clip_len,
                                   rtol=1e-6)
        # legacy mode preserves the reference's 56-D quirk obs
        env_legacy = DPEnvV3(clip="walk", reward_mode="imitation",
                             control_mode="pd", n_substeps=2,
                             obs_mode="legacy")
        assert env_legacy.observation_size == 57

    def test_cursor_scales_to_clip_frame_rate(self):
        """Clips are not all 30 fps (spinkick 60, backflip 16, spin 24): the
        cursor must advance control_dt/clip_dt frames per 30 Hz control
        step, or fast clips get imitated in slow motion with velocity
        targets inconsistent with pose targets."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env60 = DPEnvV3(clip="spinkick", reward_mode="imitation_dm",
                        control_mode="pd_residual", n_substeps=2)
        assert env60.cursor_scale == pytest.approx(2.0, rel=0.01)
        s = env60.reset_at(jax.random.PRNGKey(0), 10)
        # one control step (1/30 s) advances two 60 fps frames
        idx, _ = env60._clip_index(s.mocap_idx + 1, s.init_idx)
        assert int(idx) == 12
        env30 = DPEnvV3(clip="walk", reward_mode="imitation_dm",
                        control_mode="pd_residual", n_substeps=2)
        assert env30.cursor_scale == pytest.approx(1.0, rel=0.01)
        env16 = DPEnvV3(clip="backflip", reward_mode="imitation_dm",
                        control_mode="pd_residual", n_substeps=2)
        assert env16.cursor_scale == pytest.approx(0.533, rel=0.02)
        s = env16.reset_at(jax.random.PRNGKey(0), 0)
        # two control steps ≈ one 16 fps frame
        idx, _ = env16._clip_index(s.mocap_idx + 2, s.init_idx)
        assert int(idx) == 1

    def test_termination_defaults(self):
        """Imitation modes default to the original fall-contact rule; the
        standup task keeps the reference's CoM bounds.  The CoM rule kills
        valid acrobatics: backflip/cartwheel clips legitimately dip below
        z=0.7 and spinkick's crouch passes at 0.752."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        assert DPEnvV3(clip="walk").termination == "com"
        env = DPEnvV3(clip="spinkick", reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2)
        assert env.termination == "fall_contact"

    def test_fall_contact_term_behaviour(self):
        import dataclasses

        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="walk", reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2)
        # standing start: no fall
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        s1 = jax.jit(env.step)(s, jnp.zeros(28))
        assert not bool(s1.done)
        # chest-down on the floor: disallowed contact → done
        qpos = s.qpos.at[2].set(0.2).at[3:7].set(
            jnp.asarray([0.7071, 0.0, 0.7071, 0.0]))
        s = dataclasses.replace(s, qpos=qpos)
        step = jax.jit(env.step)
        done = False
        for _ in range(10):
            s = step(s, jnp.zeros(28))
            done = done or bool(s.done)
        assert done

    def test_full_obs_heading_invariant(self):
        """The root features of the 'full' obs must be invariant to yaw and
        to x-y translation (heading normalization)."""
        from deepmimic_mujoco_tpu.envs.dp_env_v3 import root_obs
        from deepmimic_mujoco_tpu.utils import quaternion as quat

        key = jax.random.PRNGKey(3)
        qpos = jax.random.normal(key, (35,))
        qpos = qpos.at[3:7].set(quat.normalize(qpos[3:7]))
        qvel = jax.random.normal(jax.random.PRNGKey(4), (34,))
        base = root_obs(qpos, qvel)

        yaw = jnp.asarray([jnp.cos(0.6), 0.0, 0.0, jnp.sin(0.6)])
        qpos2 = qpos.at[3:7].set(quat.mul(yaw, qpos[3:7]))
        qpos2 = qpos2.at[0:2].add(jnp.asarray([3.0, -2.0]))
        qvel2 = qvel.at[0:3].set(quat.rotate(yaw, qvel[0:3]))
        rotated = root_obs(qpos2, qvel2)
        np.testing.assert_allclose(np.asarray(base), np.asarray(rotated),
                                   atol=1e-5)

    def test_pd_tracks_mocap_joints(self):
        """PD target = current clip frame → mean joint error stays small
        (balance is not expected; joint tracking is)."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="walk", reward_mode="imitation",
                      control_mode="pd", n_substeps=2)
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        step = jax.jit(env.step)
        errs = []
        for _ in range(10):
            target = env.clip_qpos[s.mocap_idx % env.clip_len][7:]
            s = step(s, target)
            ref = env.clip_qpos[s.mocap_idx % env.clip_len]
            errs.append(float(jnp.abs(s.qpos[7:] - ref[7:]).mean()))
        assert np.isfinite(errs).all()
        assert np.mean(errs) < 0.15, errs

    def test_time_cap_terminates(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="walk", max_episode_steps=3)
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        step = jax.jit(env.step)
        for _ in range(3):
            s = step(s, jnp.zeros(28))
        assert bool(s.done)

    @pytest.mark.slow
    def test_rsi_reset_mode_in_trpo(self):
        """reset_mode='rsi' runs and the post-done states differ from the
        standing pose (mocap frames)."""
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk", reward_mode="imitation",
                      control_mode="pd", n_substeps=2, max_episode_steps=4)
        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size)
        cfg = TRPOConfig(horizon=8, num_envs=4, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=8, line_search_steps=2,
                         reset_mode="rsi")
        learner = TRPO(env, policy, cfg)
        state = learner.init(jax.random.PRNGKey(0))
        state, stats = learner.iteration(state)
        assert np.isfinite(float(stats.meankl))

    def test_imitation_reward_continuous_across_wrap(self):
        """Cyclic clips re-base the root target each pass (reference
        mocap_v2.play phase_offset); the reward for a perfect tracker must
        not collapse after the first cycle."""
        import dataclasses

        from deepmimic_mujoco_tpu.envs import DPEnvV3

        # n_substeps=2 → 30 Hz control = the walk clip rate (cursor scale 1)
        env = DPEnvV3(clip="walk", reward_mode="imitation", n_substeps=2)
        T = env.clip_len
        step = jax.jit(env.step)
        per_cycle = []
        rews = []
        for t in range(2 * T):
            idx, cyc = t % T, t // T
            qp = env.clip_qpos[idx].at[0:3].add(cyc * env.cycle_offset)
            qv = env.clip_qvel[idx]
            s = env._state(qp, qv, jax.random.PRNGKey(0),
                           jnp.asarray(idx), jnp.asarray(t))
            rews.append(float(step(s, qp[7:]).reward))
        per_cycle = [np.mean(rews[:T]), np.mean(rews[T:])]
        assert abs(per_cycle[0] - per_cycle[1]) < 0.02, per_cycle
        assert per_cycle[1] > 0.5, per_cycle

    @pytest.mark.parametrize("clip", ["humanoid3d_run", "humanoid3d_punch"])
    def test_imitation_env_other_clips(self, clip):
        """Imitation env works across clip types (wrap + non-looping)."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip=clip, reward_mode="imitation",
                      control_mode="pd_residual", n_substeps=2)
        s = env.reset(jax.random.PRNGKey(0))
        s = jax.jit(env.step)(s, jnp.zeros(28))
        assert bool(jnp.isfinite(s.obs).all())
        assert 0.0 <= float(s.reward) <= 1.0
        if env.clip.loop == "none":
            np.testing.assert_allclose(np.asarray(env.cycle_offset), 0.0)

    @pytest.mark.slow
    @pytest.mark.parametrize("env_cls", [DPEnvV1, DPEnvV2])
    def test_trpo_trains_v1_v2(self, env_cls):
        """v1/v2 lack a noise reset (so does the reference's — trpo.py:79 is
        v3-only); the trainer must fall back to their mocap reset."""
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = env_cls(clip="walk")
        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size)
        cfg = TRPOConfig(horizon=6, num_envs=2, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        learner = TRPO(env, policy, cfg)
        state, stats = learner.iteration(learner.init(jax.random.PRNGKey(0)))
        assert np.isfinite(float(stats.meankl))


class TestMultiClip:
    """Skill-conditioned multi-clip imitation env (envs/multi_clip.py)."""

    @pytest.fixture(scope="class")
    def env(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3Multi

        return DPEnvV3Multi(clips=("walk", "run", "punch"))

    def test_obs_layout(self, env):
        assert env.observation_size == 3 + 1 + 11 + 28 + 28
        s = env.reset_at(jax.random.PRNGKey(0), 1, 4)
        onehot = np.asarray(s.obs[:3])
        np.testing.assert_allclose(onehot, [0, 1, 0])
        np.testing.assert_allclose(
            float(s.obs[3]), 4 / float(env.clip_lens[1]), rtol=1e-6)

    def test_batched_step_mixed_clips(self, env):
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        s = jax.vmap(env.reset)(keys)
        assert len(set(s.clip_id.tolist())) > 1  # several skills drawn
        step = jax.jit(jax.vmap(env.step))
        for _ in range(3):
            s = step(s, jnp.zeros((8, 28)))
        assert bool(jnp.isfinite(s.obs).all())
        assert bool((s.reward >= 0).all() & (s.reward <= 1).all())

    def test_nonloop_clip_ends_episode(self, env):
        k = 2  # punch, loop == none
        T = int(env.clip_lens[k])
        s = env.reset_at(jax.random.PRNGKey(0), k, T - 2)
        step = jax.jit(env.step)
        s = step(s, jnp.zeros(28))
        s = step(s, jnp.zeros(28))
        assert bool(s.done)

    @pytest.mark.slow
    def test_trains_with_trpo(self, env):
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.models import MlpPolicy

        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size, fixed_logstd=-2.0)
        cfg = TRPOConfig(horizon=6, num_envs=4, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2,
                         reset_mode="rsi")
        learner = TRPO(env, policy, cfg)
        state, stats = learner.iteration(learner.init(jax.random.PRNGKey(0)))
        assert np.isfinite(float(stats.meankl))

    def test_imitation_dm_reward(self):
        """Original-spec DeepMimic reward: a perfect tracker scores ~1 and
        the reward is continuous across clip wraps."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="walk", reward_mode="imitation_dm", n_substeps=2)
        T = env.clip_len
        step = jax.jit(env.step)
        rews = []
        for t in range(2 * T):
            idx, cyc = t % T, t // T
            qp = env.clip_qpos[idx].at[0:3].add(cyc * env.cycle_offset)
            s = env._state(qp, env.clip_qvel[idx], jax.random.PRNGKey(0),
                           jnp.asarray(idx), jnp.asarray(t))
            rews.append(float(step(s, qp[7:]).reward))
        c0, c1 = np.mean(rews[:T]), np.mean(rews[T:])
        # kinematic reset + one full 1/30 s torque step drifts slightly
        # from the next frame; ~0.89 with 2 substeps (was ~0.93 with 1)
        assert c0 > 0.85, c0
        assert abs(c0 - c1) < 0.02, (c0, c1)


class TestCursorRegressions:
    """Round-3 regression tests for the two confirmed cursor bugs:

    1. ``DPEnvV3.step`` dropped ``init_idx`` from the observation — the phase
       channel restarted from init 0 after one step, scrambling the time
       index for every RSI episode on a non-30fps clip (spinkick trained
       against it in r2).
    2. ``_clip_index`` derived ``cycles`` from the raw position but ``idx``
       from the rounded one: once per cycle (pos ∈ [T-0.5, T)) the index
       wrapped to frame 0 without the root re-basing, spiking the imitation
       reward with a spurious ~one-cycle root error.
    """

    def test_phase_obs_tracks_init_idx_after_step(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="spinkick", reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2)
        T = env.clip_len
        s = env.reset_at(jax.random.PRNGKey(0), 40)
        assert float(s.obs[0]) == pytest.approx(40 / T, abs=1e-6)
        s1 = jax.jit(env.step)(s, jnp.zeros(28))
        # the obs phase must agree with the reward's cursor (init + elapsed
        # · cursor_scale), i.e. ≈ (40 + 2)/T — not the init-0 clock ≈ 2/T
        idx, _ = env._clip_index(s1.mocap_idx, s1.init_idx)
        assert float(s1.obs[0]) == pytest.approx(float(idx) / T, abs=1e-6)
        assert float(s1.obs[0]) == pytest.approx(
            (40 + env.cursor_scale) / T, abs=1.0 / T)

    def test_clip_index_cycles_wrap_with_idx(self):
        """Invariant: cycles·T + idx == round(pos) for wrapping clips, at
        every control step — including the once-per-cycle rounding window
        where the old formula de-synced them."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        for clip in ("walk", "spinkick"):
            env = DPEnvV3(clip=clip, reward_mode="imitation_dm",
                          control_mode="pd_residual", n_substeps=2)
            T = env.clip_len
            steps = int(np.ceil(3 * T / env.cursor_scale)) + 2
            m = jnp.arange(steps)
            idx, cyc = jax.vmap(lambda i: env._clip_index(i, 0))(m)
            pos = np.arange(steps) * env.cursor_scale
            idx_r = np.round(pos).astype(int)
            np.testing.assert_array_equal(np.asarray(idx), idx_r % T)
            np.testing.assert_array_equal(
                np.asarray(cyc).astype(int), idx_r // T)
            # the regression window is actually exercised by the sweep
            assert ((pos % T > T - 0.5) & (idx_r % T == 0)).any(), clip

    def test_clip_index_cycles_consistent_multi_and_surface(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3Multi
        from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
            DeepMimicSurfaceEnv,
        )

        menv = DPEnvV3Multi(clips=("walk", "spinkick"))
        for k in range(2):
            T = int(menv.clip_lens[k])
            scale = float(menv.clip_scales[k])
            steps = int(np.ceil(3 * T / scale)) + 2
            idx, cyc = jax.vmap(
                lambda i: menv._clip_index(jnp.asarray(k), i, 0)
            )(jnp.arange(steps))
            idx_r = np.round(np.arange(steps) * scale).astype(int)
            np.testing.assert_array_equal(np.asarray(idx), idx_r % T)
            np.testing.assert_array_equal(
                np.asarray(cyc).astype(int), idx_r // T)

        senv = DeepMimicSurfaceEnv(clip="walk", n_substeps=2)
        T = senv.clip_len
        steps = int(np.ceil(3 * T / senv.cursor_scale)) + 2
        idx, cyc = jax.vmap(lambda i: senv._clip_index(i, 0))(
            jnp.arange(steps))
        idx_r = np.round(
            np.arange(steps) * senv.cursor_scale).astype(int)
        np.testing.assert_array_equal(np.asarray(idx), idx_r % T)
        np.testing.assert_array_equal(np.asarray(cyc).astype(int),
                                      idx_r // T)

    def test_multi_clip_per_skill_fall_lists(self):
        """Fall-contact candidates are selected per clip_id — arg files
        differ per skill upstream (args/train_humanoid3d_*_args.txt)."""
        from deepmimic_mujoco_tpu.envs import DPEnvV3Multi
        from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
            load_fall_contact_bodies,
        )

        env = DPEnvV3Multi(clips=("walk", "getup_facedown"))
        assert env._fall_cand.shape[0] == 2
        if (load_fall_contact_bodies("walk")
                != load_fall_contact_bodies("getup_facedown")):
            assert bool(
                (env._fall_cand[0] != env._fall_cand[1]).any())
        # batched step with mixed clips still jits
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        s = jax.vmap(env.reset)(keys)
        s = jax.jit(jax.vmap(env.step))(s, jnp.zeros((4, 28)))
        assert bool(jnp.isfinite(s.reward).all())
