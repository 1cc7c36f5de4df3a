"""Tests for the original-stack parity layer (dp_policy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.dp_policy import normalizer
from deepmimic_mujoco_tpu.dp_policy.exp_params import ExpParams
from deepmimic_mujoco_tpu.dp_policy.path import Path, Terminate
from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent
from deepmimic_mujoco_tpu.dp_policy.replay_buffer import ReplayBuffer
from deepmimic_mujoco_tpu.dp_policy.rl_world import RLWorld, build_agent
from deepmimic_mujoco_tpu.utils.arg_parser import ArgParser


class TestArgParser:
    def test_key_value_format(self, tmp_path):
        f = tmp_path / "args.txt"
        f.write_text(
            "# comment line\n--scene imitate\n--num_update_substeps 10\n"
            "--fall_contact_bodies 0 1 2\n--terrain_file none\n")
        p = ArgParser()
        p.load_file(str(f))
        assert p.parse_string("scene") == "imitate"
        assert p.parse_int("num_update_substeps") == 10
        assert p.parse_ints("fall_contact_bodies") == [0, 1, 2]
        assert p.parse_string("missing", "dflt") == "dflt"


class TestNormalizer:
    def test_update_and_normalize(self):
        ns = normalizer.make(3)
        st = normalizer.init(3)
        rng = np.random.RandomState(0)
        data = rng.randn(500, 3) * 3.0 + 2.0
        st = ns.update(st, jnp.asarray(data, jnp.float32))
        np.testing.assert_allclose(np.asarray(st.mean), data.mean(0), atol=0.05)
        np.testing.assert_allclose(np.asarray(st.std), data.std(0), rtol=0.05)
        out = ns.normalize(st, jnp.asarray(data[:10], jnp.float32))
        assert np.abs(np.asarray(out)).max() < 5

    def test_none_group_bypasses(self):
        ns = normalizer.make(2, groups_ids=[0, normalizer.Groups.NONE])
        st = normalizer.init(2)
        st = ns.update(st, jnp.asarray([[10.0, 10.0]] * 100))
        out = np.asarray(ns.normalize(st, jnp.asarray([10.0, 10.0])))
        assert abs(out[0]) < 1.0      # normalized
        assert out[1] == 10.0          # passthrough


class TestReplayBuffer:
    def _path(self, n, term=Terminate.FAIL, exp_every=2):
        p = Path()
        p.states = [np.full(3, i, np.float32) for i in range(n + 1)]
        p.actions = [np.full(2, i, np.float32) for i in range(n)]
        p.rewards = [float(i) for i in range(n)]
        p.logps = [0.0] * n
        p.flags = [1 if i % exp_every == 0 else 0 for i in range(n)]
        p.terminate = term
        return p

    def test_store_and_sample(self):
        """A path of n steps occupies n+1 records, the last being the
        terminal/bootstrap state (reference replay_buffer.py:34-70)."""
        buf = ReplayBuffer(100)
        pid = buf.store(self._path(10))
        assert pid == 0
        assert buf.get_current_size() == 11
        assert buf.total_count == 10        # sample count excludes the end
        idx = buf.sample(5, rng=np.random.RandomState(0))
        assert len(idx) == 5
        # filtered samples must not be path ends
        assert not buf.is_path_end(idx).any()

    def test_terminal_flags_on_end_record(self):
        buf = ReplayBuffer(100)
        buf.store(self._path(5, Terminate.FAIL))
        end_idx = np.array([5])             # record 5 = terminal state
        assert buf.is_path_end(end_idx).all()
        assert buf.check_terminal_flag(end_idx, Terminate.FAIL).all()
        assert not buf.check_terminal_flag(end_idx, Terminate.SUCC).any()
        # the stored terminal state is the post-step observation
        np.testing.assert_array_equal(buf.get("states", end_idx)[0],
                                      np.full(3, 5, np.float32))

    def test_exp_flag_filtering(self):
        buf = ReplayBuffer(100)
        buf.store(self._path(6, exp_every=2))
        idx = buf.get_idx_filtered(1)
        np.testing.assert_array_equal(idx, [0, 2, 4])
        assert buf.count_filtered(1) == 3

    def test_ring_wraparound(self):
        buf = ReplayBuffer(12)
        buf.store(self._path(10))
        buf.store(self._path(10))
        assert buf.get_current_size() == 12
        assert buf.num_paths == 2

    def test_clear_keeps_lifetime_count(self):
        buf = ReplayBuffer(100)
        buf.store(self._path(10))
        buf.clear()
        assert buf.get_current_size() == 0
        assert buf.total_count == 10


class TestExpParams:
    def test_lerp(self):
        a = ExpParams(rate=1.0, noise=0.05)
        b = ExpParams(rate=0.2, noise=0.05)
        mid = a.lerp(b, 0.5)
        assert mid.rate == pytest.approx(0.6)
        assert mid.noise == pytest.approx(0.05)


class TestPPOAgent:
    @pytest.fixture(scope="class")
    def agent(self):
        return PPOAgent(state_size=12, action_size=4,
                        spec={"MiniBatchSize": 8, "BatchSize": 32})

    def test_init_net_sizes(self, agent):
        params = agent.init(jax.random.PRNGKey(0))
        assert params["actor"][0]["w"].shape == (12, 1024)
        assert params["actor"][1]["w"].shape == (1024, 512)
        assert params["actor"][2]["w"].shape == (512, 4)
        assert params["critic"][2]["w"].shape == (512, 1)

    def test_decide_action_logp(self, agent):
        params = agent.init(jax.random.PRNGKey(0))
        s = jnp.ones(12)
        a, logp = agent.decide_action(params, jax.random.PRNGKey(1), s, True)
        assert a.shape == (4,)
        assert np.isfinite(float(logp))
        # deterministic when not exploring
        a0, _ = agent.decide_action(params, jax.random.PRNGKey(1), s, False)
        a1, _ = agent.decide_action(params, jax.random.PRNGKey(2), s, False)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_update_runs_and_improves_critic(self, agent):
        params = agent.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        n = 32
        states = jnp.asarray(rng.randn(n + 1, 12), jnp.float32)
        actions = jnp.asarray(rng.randn(n, 4) * 0.1, jnp.float32)
        logps = jnp.full((n,), 2.0, jnp.float32)
        rewards = jnp.ones(n, jnp.float32) * 0.5
        path_end = jnp.zeros(n, bool).at[15].set(True).at[31].set(True)
        params2, metrics = agent.update(
            params, jax.random.PRNGKey(1), states, actions, logps, rewards,
            path_end)
        assert np.isfinite(float(metrics["critic_loss"]))
        assert np.isfinite(float(metrics["actor_loss"]))
        assert 0.0 <= float(metrics["clip_frac"]) <= 1.0
        assert float(params2["sample_count"]) == n

    def test_value_bounds_from_reward(self):
        agent = PPOAgent(4, 2, reward_bounds=(0.0, 1.0))
        assert agent.val_min == 0.0
        assert agent.val_max == pytest.approx(1.0 / (1.0 - 0.95))


class _ToyEnv:
    """Minimal functional env for driver tests: 1-D integrator, episode ends
    after a fixed number of steps."""

    observation_size = 4
    action_size = 2
    max_episode_steps = 7
    clip_wraps = True
    clip_len = 0

    def __init__(self, horizon=7):
        self.max_episode_steps = horizon

    def reset(self, key):
        from deepmimic_mujoco_tpu.envs.types import EnvState

        z = jnp.zeros(())
        return EnvState(
            qpos=jnp.zeros(2), qvel=jnp.zeros(2), obs=jnp.zeros(4),
            reward=jnp.zeros(()), done=jnp.zeros((), bool),
            mocap_idx=jnp.zeros((), jnp.int32),
            init_idx=jnp.zeros((), jnp.int32),
            step_count=jnp.zeros((), jnp.int32), key=key)

    def step(self, state, action):
        import dataclasses

        qpos = state.qpos + 0.1 * action
        count = state.step_count + 1
        return dataclasses.replace(
            state, qpos=qpos,
            obs=jnp.concatenate([qpos, 0.1 * jnp.ones(2)]),
            reward=jnp.ones(()), done=count >= self.max_episode_steps,
            step_count=count)


class TestRLAgentDriverCadence:
    """The replay-buffer-driven update cadence
    (reference rl_agent.py:123-136 + ppo_agent.py:165-271): paths accumulate
    as n+1-record entries; the update fires once the buffer holds more than
    BatchSize samples and at least one exploration sample; training consumes
    the whole buffer and clears it."""

    def _driver(self, batch_size=64, num_envs=4, horizon=7):
        from deepmimic_mujoco_tpu.dp_policy.rl_agent import RLAgentDriver

        env = _ToyEnv(horizon)
        agent = PPOAgent(env.observation_size, env.action_size,
                         spec={"BatchSize": batch_size, "MiniBatchSize": 16,
                               "ReplayBufferSize": 4096})
        return env, agent, RLAgentDriver(env, agent, num_envs=num_envs,
                                         seed=0, chunk=8)

    def test_update_fires_on_batch_size(self):
        env, agent, driver = self._driver()
        params = agent.init(jax.random.PRNGKey(0))
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        env_state = jax.vmap(env.reset)(keys)
        params, env_state, metrics = driver.train_iteration(params, env_state)
        # the update consumed > BatchSize samples then cleared the ring
        assert float(params["sample_count"]) > agent.batch_size
        assert driver.replay_buffer.get_current_size() == 0
        assert driver.iter == 1
        assert np.isfinite(metrics["critic_loss"])

    def test_paths_have_terminal_records(self):
        env, agent, driver = self._driver(batch_size=10**9)  # never train
        params = agent.init(jax.random.PRNGKey(0))
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        env_state = jax.vmap(env.reset)(keys)
        driver._key, k = jax.random.split(driver._key)
        env_state, traj = driver._rollout(params, env_state, k)
        driver._absorb_chunk(traj)
        buf = driver.replay_buffer
        # chunk=8, horizon=7 → each env closed one 7-step path (8 records)
        assert buf.num_paths == 4
        assert buf.get_current_size() == 4 * 8
        ends = np.flatnonzero(buf.end_mask())
        assert len(ends) == 4
        # horizon-capped paths terminate NULL, not FAIL
        assert not buf.fail_mask().any()

    def test_train_on_batch_fail_bootstraps_zero(self):
        """FAIL terminal records pin the bootstrap value to val_min — the
        original's vals[is_fail] = val_fail (ppo_agent.py:275-289)."""
        agent = PPOAgent(3, 2, spec={"MiniBatchSize": 4, "BatchSize": 16,
                                     "Epochs": 1})
        params = agent.init(jax.random.PRNGKey(0))
        n = 8
        states = jnp.asarray(np.random.RandomState(0).randn(n, 3),
                             jnp.float32)
        is_end = jnp.zeros(n, bool).at[n - 1].set(True)
        is_fail = jnp.zeros(n, bool).at[n - 1].set(True)
        rewards = jnp.ones(n, jnp.float32)
        params2, metrics = agent.train_on_batch(
            params, jax.random.PRNGKey(1), states,
            jnp.zeros((n, 2)), jnp.zeros(n), rewards,
            is_end, is_fail, jnp.zeros(n, bool),
            jnp.zeros(n, bool).at[0].set(True), 2)
        assert np.isfinite(metrics["critic_loss"])
        assert float(params2["sample_count"]) == n - 1


class TestDeepMimicSurface:
    """The original 197-D/36-D training surface as a functional env."""

    @pytest.fixture(scope="class")
    def env(self):
        from deepmimic_mujoco_tpu.envs import DeepMimicSurfaceEnv

        return DeepMimicSurfaceEnv(clip="walk", max_episode_steps=50)

    def test_state_layout(self, env):
        s = env.reset_at(jax.random.PRNGKey(0), 3)
        assert s.obs.shape == (197,)
        assert np.isfinite(np.asarray(s.obs)).all()
        assert float(s.obs[0]) == pytest.approx(3 / env.clip_len)
        # state[1] = root height by default (~0.85 standing)
        assert 0.5 < float(s.obs[1]) < 1.2
        # root-relative block: first body is the root → rel pos 0
        np.testing.assert_allclose(np.asarray(s.obs[2:5]), 0.0, atol=1e-6)

    def test_quirk_lateral(self):
        from deepmimic_mujoco_tpu.envs import DeepMimicSurfaceEnv

        env = DeepMimicSurfaceEnv(clip="walk", quirk_lateral=True,
                                  write_phase=False)
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        assert float(s.obs[0]) == 0.0   # phase quirk: never written
        qpos = np.asarray(s.qpos)
        assert float(s.obs[1]) == pytest.approx(qpos[1], abs=1e-5)

    def test_step_and_reward(self, env):
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        from deepmimic_mujoco_tpu.envs.deepmimic_surface import (
            targets_to_action,
        )

        # feed-forward action from the next clip frame → high reward
        a = targets_to_action(np.asarray(env.clip_qpos[1][7:]))
        s1 = jax.jit(env.step)(s, jnp.asarray(a))
        assert 0.3 < float(s1.reward) <= 1.0
        assert not bool(s1.done)

    def test_trpo_trains_on_surface(self, env):
        """The 197-D/36-D surface is a regular functional env — TRPO can
        train on it directly (not just the dp_policy PPO stack)."""
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.models import MlpPolicy

        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size, fixed_logstd=-2.0)
        cfg = TRPOConfig(horizon=4, num_envs=2, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2,
                         reset_mode="rsi")
        learner = TRPO(env, policy, cfg)
        state, stats = learner.iteration(learner.init(jax.random.PRNGKey(0)))
        assert np.isfinite(float(stats.meankl))

    def test_fall_contact_terminates(self, env):
        """Dropping the character on its chest triggers the fall-contact
        termination (original --fall_contact_bodies)."""
        s = env.reset_at(jax.random.PRNGKey(0), 0)
        # lay the root nearly on the ground, chest down
        qpos = s.qpos.at[2].set(0.2).at[3:7].set(
            jnp.asarray([0.7071, 0.0, 0.7071, 0.0]))
        import dataclasses

        s = dataclasses.replace(s, qpos=qpos)
        step = jax.jit(env.step)
        done = False
        for _ in range(10):
            s = step(s, jnp.zeros(36))
            done = done or bool(s.done)
        assert done


class TestPGAgent:
    """Vanilla policy-gradient agent (pg_agent.py parity)."""

    def test_build_from_spec_and_train(self):
        from deepmimic_mujoco_tpu.dp_policy.pg_agent import PGAgent

        agent = build_agent({"AgentType": "PG", "MiniBatchSize": 4,
                             "BatchSize": 16}, 6, 3)
        assert isinstance(agent, PGAgent)
        params = agent.init(jax.random.PRNGKey(0))
        n = 8
        rng = np.random.RandomState(0)
        states = jnp.asarray(rng.randn(n, 6), jnp.float32)
        is_end = jnp.zeros(n, bool).at[n - 1].set(True)
        params2, metrics = agent.train_on_batch(
            params, jax.random.PRNGKey(1), states, jnp.zeros((n, 3)),
            jnp.zeros(n), jnp.ones(n), is_end, is_end,
            jnp.zeros(n, bool), jnp.zeros(n, bool).at[0].set(True), 2)
        assert np.isfinite(metrics["critic_loss"])
        assert float(metrics["clip_frac"]) == 0.0  # PG has no ratio clip

    def test_actor_loss_is_advantage_weighted_regression(self):
        agent = build_agent({"AgentType": "PG"}, 4, 2)
        params = agent.init(jax.random.PRNGKey(0))
        s = jnp.ones((5, 4))
        mean = agent.actor_mean(params, s)
        # actions at the mean → regression term 0; positive adv ⇒ loss is
        # just bound+decay, independent of adv
        l0, _ = agent._actor_loss(params, s, mean, jnp.zeros(5),
                                  jnp.ones(5))
        l1, _ = agent._actor_loss(params, s, mean, jnp.zeros(5),
                                  10.0 * jnp.ones(5))
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


class TestRLWorld:
    def test_build_agent_from_spec(self):
        spec = {"AgentType": "PPO", "MiniBatchSize": 8}
        agent = build_agent(spec, 197, 36)
        assert agent.state_size == 197

    def test_world_get_action_zero_state(self, tmp_path):
        import json

        spec_file = tmp_path / "agent.json"
        spec_file.write_text(json.dumps({"AgentType": "PPO"}))
        arg_file = tmp_path / "run_args.txt"
        arg_file.write_text(f"--agent_files {spec_file}\n")
        p = ArgParser()
        p.load_file(str(arg_file))
        world = RLWorld(p, state_size=197, action_size=36)
        ac = world.get_action(0, np.zeros(197))
        assert ac.shape == (36,)
        assert np.isfinite(ac).all()


class TestSuccClassification:
    """Round-3 regression: success for non-looping clips must use the env's
    SCALED cursor predicate.  getup_facedown is 60 fps (cursor_scale ≈ 2),
    so the motion finishes at raw mocap_idx ≈ (T-1)/2 — a raw-counter
    comparison (mocap_idx >= clip_len - 1) labelled every completed motion
    Terminate.FAIL and bootstrapped its value with val_min."""

    def test_clip_over_vs_raw_counter(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="getup_facedown", reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2)
        assert not env.clip_wraps
        assert env.cursor_scale == pytest.approx(2.0, rel=0.02)
        T = env.clip_len
        m_done = int(np.ceil((T - 1) / env.cursor_scale))
        # the motion is over well before the raw counter reaches T-1
        assert m_done < T - 1
        assert bool(env._clip_over(jnp.asarray(m_done), jnp.asarray(0)))
        assert not bool(env._clip_over(jnp.asarray(m_done - 2),
                                       jnp.asarray(0)))

    def test_driver_rollout_classifies_succ(self):
        """Drive the real env to the end of the motion inside the jitted
        rollout and assert the stored path terminates SUCC, not FAIL."""
        from deepmimic_mujoco_tpu.dp_policy.path import Terminate
        from deepmimic_mujoco_tpu.dp_policy.rl_agent import RLAgentDriver
        from deepmimic_mujoco_tpu.envs import DPEnvV3

        env = DPEnvV3(clip="getup_facedown", reward_mode="imitation_dm",
                      control_mode="pd_residual", n_substeps=2)
        T = env.clip_len
        agent = PPOAgent(env.observation_size, env.action_size,
                         spec={"BatchSize": 10**9, "MiniBatchSize": 16,
                               "ReplayBufferSize": 4096})
        chunk = int(np.ceil((T - 1) / env.cursor_scale)) + 4
        driver = RLAgentDriver(env, agent, num_envs=2, seed=0, chunk=chunk)
        params = agent.init(jax.random.PRNGKey(0))
        # start both envs 4 raw steps before the motion end so a SUCC end is
        # reached quickly; the residual-PD zero action tracks the clip
        start = int(T - 1 - 4 * env.cursor_scale)
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        env_state = jax.vmap(
            lambda k: env.reset_at(k, jnp.asarray(start)))(keys)
        driver._key, k = jax.random.split(driver._key)
        env_state, traj = driver._rollout(params, env_state, k)
        driver._absorb_chunk(traj)
        buf = driver.replay_buffer
        assert buf.num_paths >= 1
        assert buf.succ_mask().any(), (
            "completed non-looping motion must classify Terminate.SUCC")
