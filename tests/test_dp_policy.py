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
    def _path(self, n, term=Terminate.FAIL):
        p = Path()
        p.states = [np.full(3, i, np.float32) for i in range(n + 1)]
        p.actions = [np.full(2, i, np.float32) for i in range(n)]
        p.rewards = [float(i) for i in range(n)]
        p.logps = [0.0] * n
        p.terminate = term
        return p

    def test_store_and_sample(self):
        buf = ReplayBuffer(100)
        pid = buf.store(self._path(10))
        assert pid == 0
        assert buf.get_current_size() == 10
        idx = buf.sample(5, rng=np.random.RandomState(0))
        assert len(idx) == 5
        # filtered samples must not be path ends
        assert not buf.is_path_end(idx).any()

    def test_terminal_flags(self):
        buf = ReplayBuffer(100)
        buf.store(self._path(5, Terminate.FAIL))
        end_idx = np.array([4])
        assert buf.check_terminal_flag(end_idx, Terminate.FAIL).all()
        assert not buf.check_terminal_flag(end_idx, Terminate.SUCC).any()

    def test_ring_wraparound(self):
        buf = ReplayBuffer(12)
        buf.store(self._path(10))
        buf.store(self._path(10))
        assert buf.get_current_size() == 12
        assert buf.num_paths == 2


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
