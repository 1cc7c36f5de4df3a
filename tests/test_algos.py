"""Algorithm tests: GAE vs a literal numpy transcription of the reference
recursion, CG, Adam parity, checkpoint roundtrip, and TRPO/GAIL smoke."""

import numpy as np
import pytest


import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.algos import adam
from deepmimic_mujoco_tpu.algos.cg import cg
from deepmimic_mujoco_tpu.algos.gae import add_vtarg_and_adv
from deepmimic_mujoco_tpu.utils.math import discount_with_boundaries, explained_variance


def gae_numpy(rew, vpred, new, nextvpred, gamma, lam):
    """Literal transcription of the reference recursion (trpo.py:83-94)."""
    new = np.append(new, 0)
    vpred = np.append(vpred, nextvpred)
    T = len(rew)
    adv = np.empty(T, "float64")
    lastgaelam = 0.0
    for t in reversed(range(T)):
        nonterminal = 1 - new[t + 1]
        delta = rew[t] + gamma * vpred[t + 1] * nonterminal - vpred[t]
        adv[t] = lastgaelam = delta + gamma * lam * nonterminal * lastgaelam
    return adv, adv + vpred[:-1]


@pytest.mark.fast
class TestGAE:
    def test_matches_reference_recursion(self):
        rng = np.random.RandomState(0)
        T = 64
        rew = rng.randn(T).astype(np.float32)
        vpred = rng.randn(T).astype(np.float32)
        new = np.zeros(T, np.float32)
        new[[0, 17, 40]] = 1
        nextvpred = 0.37
        adv, tdlam = add_vtarg_and_adv(
            jnp.asarray(rew), jnp.asarray(vpred), jnp.asarray(new),
            jnp.asarray(nextvpred, jnp.float32), 0.995, 0.97)
        adv_np, tdlam_np = gae_numpy(rew, vpred, new, nextvpred, 0.995, 0.97)
        np.testing.assert_allclose(np.asarray(adv), adv_np, atol=1e-4)
        np.testing.assert_allclose(np.asarray(tdlam), tdlam_np, atol=1e-4)

    def test_batched(self):
        rng = np.random.RandomState(1)
        T, B = 32, 4
        rew = rng.randn(T, B).astype(np.float32)
        vpred = rng.randn(T, B).astype(np.float32)
        new = (rng.rand(T, B) < 0.1).astype(np.float32)
        nextvpred = rng.randn(B).astype(np.float32)
        adv, _ = add_vtarg_and_adv(
            jnp.asarray(rew), jnp.asarray(vpred), jnp.asarray(new),
            jnp.asarray(nextvpred), 0.99, 0.95)
        for b in range(B):
            adv_np, _ = gae_numpy(rew[:, b], vpred[:, b], new[:, b],
                                  nextvpred[b], 0.99, 0.95)
            np.testing.assert_allclose(np.asarray(adv[:, b]), adv_np, atol=1e-4)


@pytest.mark.fast
class TestCG:
    def test_solves_spd_system(self):
        rng = np.random.RandomState(0)
        A = rng.randn(12, 12)
        A = A @ A.T + 12 * np.eye(12)
        b = rng.randn(12)
        A_j = jnp.asarray(A, jnp.float32)
        x = cg(lambda v: A_j @ v, jnp.asarray(b, jnp.float32), cg_iters=12)
        np.testing.assert_allclose(np.asarray(A @ np.asarray(x, np.float64)), b, atol=1e-2)


@pytest.mark.fast
class TestAdam:
    def test_matches_reference_math(self):
        """One step vs hand-computed MpiAdam update (mpi_adam.py:30-35)."""
        theta = jnp.asarray([1.0, 2.0])
        g = jnp.asarray([0.5, -1.0])
        st = adam.init(2)
        theta2, st2 = adam.update(st, g, theta, stepsize=0.1)
        t = 1.0
        a = 0.1 * np.sqrt(1 - 0.999**t) / (1 - 0.9**t)
        m = 0.1 * np.asarray(g)
        v = 0.001 * np.square(np.asarray(g))
        want = np.asarray(theta) - a * m / (np.sqrt(v) + 1e-8)
        np.testing.assert_allclose(np.asarray(theta2), want, atol=1e-6)


@pytest.mark.fast
class TestMathUtil:
    def test_explained_variance(self):
        y = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        assert float(explained_variance(y, y)) == pytest.approx(1.0)
        assert float(explained_variance(jnp.zeros(4), y)) == pytest.approx(0.0, abs=1e-5)

    def test_discount_with_boundaries(self):
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        new = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        got = discount_with_boundaries(x, new, 0.9)
        np.testing.assert_allclose(np.asarray(got), [2.8, 2.0, 6.6, 4.0], atol=1e-5)


@pytest.mark.fast
class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from deepmimic_mujoco_tpu.io_utils import checkpoint

        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))},
                "d": jnp.asarray(3)}
        p = str(tmp_path / "ckpt")
        checkpoint.save(p, tree)
        like = jax.tree.map(jnp.zeros_like, tree)
        loaded = checkpoint.load(p, like)
        for k in ("a", "d"):
            np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(tree[k]))
        np.testing.assert_array_equal(
            np.asarray(loaded["b"]["c"]), np.asarray(tree["b"]["c"]))

    def test_structure_mismatch_raises(self, tmp_path):
        """A stale checkpoint whose leaves would mis-map (same count,
        different shapes under a different structure) must raise; the stored
        __treedef__ is validated against `like`."""
        import pytest

        from deepmimic_mujoco_tpu.io_utils import checkpoint

        tree = {"a": jnp.arange(3.0), "b": jnp.ones(2)}
        p = str(tmp_path / "ckpt")
        checkpoint.save(p, tree)
        # same leaf count, different structure AND different leaf shapes
        like = {"x": jnp.zeros(2), "y": jnp.zeros(3)}
        with pytest.raises(ValueError, match="structure mismatch"):
            checkpoint.load(p, like)
        # different leaf count always raises
        with pytest.raises(ValueError, match="leaves"):
            checkpoint.load(p, {"x": jnp.zeros(3)})

    def test_structure_drift_strict_by_default(self, tmp_path):
        """Structure drift is a HARD error unless explicitly opted out:
        reordered same-shaped leaves (e.g. equal-width actor/critic layers)
        would silently swap under positional loading."""
        import pytest

        from deepmimic_mujoco_tpu.io_utils import checkpoint

        tree = {"a": jnp.arange(3.0), "b": jnp.ones(2)}
        p = str(tmp_path / "ckpt")
        checkpoint.save(p, tree)
        # renamed keys, identical leaf shapes — must raise by default
        like = {"a": jnp.zeros(3), "b": jnp.zeros(2), "c": None}
        with pytest.raises(ValueError, match="structure mismatch"):
            checkpoint.load(p, like)
        # explicit opt-in loads positionally with a warning
        with pytest.warns(UserWarning, match="different pytree structure"):
            out = checkpoint.load(p, like, allow_structure_drift=True)
        np.testing.assert_array_equal(np.asarray(out["a"]),
                                      np.arange(3.0))
        # opt-in never overrides a SHAPE mismatch
        bad = {"x": jnp.zeros(2), "y": jnp.zeros(3)}
        with pytest.raises(ValueError, match="structure mismatch"):
            checkpoint.load(p, bad, allow_structure_drift=True)


@pytest.mark.fast
class TestDatasets:
    def test_iterbatches_drops_partial(self):
        from deepmimic_mujoco_tpu.algos.dataset import iterbatches

        arr = np.arange(10)
        batches = list(iterbatches(
            (arr,), batch_size=4, include_final_partial_batch=False, shuffle=False))
        assert [len(b[0]) for b in batches] == [4, 4]

    def test_mujoco_dset(self, tmp_path):
        from deepmimic_mujoco_tpu.algos.dataset import MujocoDset

        rng = np.random.RandomState(0)
        obs = rng.randn(3, 20, 5)
        acs = rng.randn(3, 20, 2)
        path = str(tmp_path / "expert.npz")
        np.savez(path, obs=obs, acs=acs, ep_rets=np.array([1.0, 2.0, 3.0]),
                 lens=np.array([20, 20, 20]))
        d = MujocoDset(path, traj_limitation=2)
        assert d.num_transition == 40
        ob, ac = d.get_next_batch(8)
        assert ob.shape == (8, 5) and ac.shape == (8, 2)


@pytest.mark.slow
class TestTRPOSmoke:
    def test_tiny_iteration_runs_and_respects_kl(self):
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        cfg = TRPOConfig(horizon=8, num_envs=2, g_step=1, cg_iters=3,
                         vf_iters=1, vf_batch_size=4)
        learner = TRPO(env, policy, cfg)
        state = learner.init(jax.random.PRNGKey(0))
        state, stats = learner.iteration(state)
        assert float(stats.meankl) <= cfg.max_kl * 1.5 + 1e-6
        flat = jax.flatten_util.ravel_pytree(state.params)[0]
        assert bool(jnp.isfinite(flat).all())

    def test_per_episode_monitor_rows(self, tmp_path):
        """The monitor gets one row per EPISODE with true (r, l), not
        per-iteration means repeated (reference bench/monitor.py:58-76)."""
        import csv

        from deepmimic_mujoco_tpu.algos.train_loop import train
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk", max_episode_steps=3)
        policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=28)
        cfg = TRPOConfig(horizon=6, num_envs=2, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        learner = TRPO(env, policy, cfg)
        log_dir = str(tmp_path / "logs")
        train(learner, seed=0, max_iters=3, log_dir=log_dir, verbose=False)
        with open(f"{log_dir}/monitor.json.monitor.csv") as f:
            f.readline()  # '#{json}' run-metadata header line
            rows = list(csv.DictReader(f))
        # 2 envs × 6 steps × 3 iters with 3-step episodes → 12 episodes
        assert len(rows) == 12, len(rows)
        lens = {int(float(r["l"])) for r in rows}
        assert lens == {3}, lens

    def test_resume_override_logstd(self, tmp_path):
        """Noise-annealing polish: --override-logstd replaces the
        checkpointed exploration noise after resume."""
        from deepmimic_mujoco_tpu.algos.train_loop import train
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk", max_episode_steps=3)
        policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=28,
                           fixed_logstd=-3.0)
        cfg = TRPOConfig(horizon=4, num_envs=2, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        learner = TRPO(env, policy, cfg)
        ckpt = str(tmp_path / "ck")
        train(learner, seed=0, max_iters=1, ckpt_dir=ckpt, verbose=False)
        state = train(learner, seed=0, max_iters=1, verbose=False,
                      resume_from=f"{ckpt}/trpo_state.npz",
                      override_logstd=-4.0)
        np.testing.assert_allclose(np.asarray(state.params["logstd"]), -4.0)

    def test_evaluate_export_depadded(self, tmp_path):
        """Saved trajectories contain no frozen post-done rows: each
        episode's arrays are exactly its true length."""
        from deepmimic_mujoco_tpu.algos.runner import evaluate
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk", max_episode_steps=4)
        policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=28)
        params = policy.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "trajs.npz")
        evaluate(env, policy, params, jax.random.PRNGKey(1), n_episodes=3,
                 horizon=10, save_path=path)
        z = np.load(path, allow_pickle=True)
        lens = z["lens"]
        assert (lens <= 4).all()
        for i in range(3):
            assert len(z["obs"][i]) == lens[i]
            assert len(z["acs"][i]) == lens[i]
            assert len(z["rews"][i]) == lens[i]
        # consumer check: MujocoDset flattens the ragged export cleanly
        from deepmimic_mujoco_tpu.algos.dataset import MujocoDset

        d = MujocoDset(path, traj_limitation=-1)
        assert d.num_transition == int(lens.sum())

    def test_deterministic(self):
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        cfg = TRPOConfig(horizon=8, num_envs=2, g_step=1, cg_iters=3,
                         vf_iters=1, vf_batch_size=4)
        learner = TRPO(env, policy, cfg)
        outs = []
        for _ in range(2):
            state = learner.init(jax.random.PRNGKey(7))
            state, _ = learner.iteration(state)
            outs.append(np.asarray(
                jax.flatten_util.ravel_pytree(state.params)[0]))
        np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.slow
class TestGAILSmoke:
    def test_tiny_iteration(self):
        from deepmimic_mujoco_tpu.algos.gail import GAIL, GAILConfig
        from deepmimic_mujoco_tpu.algos.trpo import TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        rng = np.random.RandomState(0)
        cfg = GAILConfig(
            trpo=TRPOConfig(horizon=8, num_envs=2, g_step=1, cg_iters=3,
                            vf_iters=1, vf_batch_size=4),
            d_batches=2,
        )
        learner = GAIL(env, policy, rng.randn(64, 56), rng.randn(64, 28), cfg)
        state = learner.init(jax.random.PRNGKey(0))
        state, stats = learner.iteration(state)
        assert np.isfinite(float(stats.d_loss))
        assert 0.0 <= float(stats.gen_acc) <= 1.0

    def test_exact_d_step_semantics(self):
        """d_exact mode = the reference's sequential d-step sweep
        (gail.py:329-343): per iteration the policy batch is consumed once in
        d_step minibatches of n//d_step, and the expert cursor advances
        sequentially (Mujoco_Dset.get_next_batch pointer)."""
        from deepmimic_mujoco_tpu.algos.gail import GAIL, GAILConfig
        from deepmimic_mujoco_tpu.algos.trpo import TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        rng = np.random.RandomState(0)
        n_exp = 50
        cfg = GAILConfig(
            trpo=TRPOConfig(horizon=8, num_envs=2, g_step=1, cg_iters=2,
                            vf_iters=1, vf_batch_size=4, line_search_steps=2),
            d_step=2, d_exact=True,
        )
        learner = GAIL(env, policy, rng.randn(n_exp, 56),
                       rng.randn(n_exp, 28), cfg)
        state = learner.init(jax.random.PRNGKey(0))
        assert int(state.expert_ptr) == 0
        state, stats = learner.iteration(state)
        # policy batch n = 8*2 = 16, d_step=2 → two sequential expert slices
        # of 8 → cursor at 16
        assert int(state.expert_ptr) == 16 % n_exp
        state, _ = learner.iteration(state)
        assert int(state.expert_ptr) == 32 % n_exp
        assert np.isfinite(float(stats.d_loss))

    def test_per_episode_records(self):
        """GAILStats carries true per-episode rows (r3): ep_lens marks
        episode ends, ep_rets holds the DISCRIMINATOR return and
        true_ep_rets the aligned TRUE env return — the monitor records real
        episodes, not repeated per-iteration means."""
        from deepmimic_mujoco_tpu.algos.gail import GAIL, GAILConfig
        from deepmimic_mujoco_tpu.algos.trpo import TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        # max_episode_steps forces deterministic episode ends inside the
        # segment so the record arrays are exercised
        env = DPEnvV3(clip="walk", max_episode_steps=5)
        policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=28)
        rng = np.random.RandomState(0)
        cfg = GAILConfig(
            trpo=TRPOConfig(horizon=12, num_envs=2, g_step=1, cg_iters=2,
                            vf_iters=1, vf_batch_size=4,
                            line_search_steps=2),
            d_batches=2,
        )
        learner = GAIL(env, policy, rng.randn(64, env.observation_size),
                       rng.randn(64, 28), cfg)
        state = learner.init(jax.random.PRNGKey(0))
        state, stats = learner.iteration(state)
        lens = np.asarray(stats.trpo.ep_lens).reshape(-1)
        rets = np.asarray(stats.trpo.ep_rets).reshape(-1)
        trues = np.asarray(stats.true_ep_rets).reshape(-1)
        assert lens.shape == rets.shape == trues.shape
        ended = lens > 0
        assert ended.sum() == int(stats.trpo.ep_count) > 0
        # alive-reward env: every episode's true return == its length
        np.testing.assert_allclose(trues[ended], lens[ended], rtol=1e-5)
        # discriminator return sums match the aggregate stat
        np.testing.assert_allclose(rets.sum(), float(stats.trpo.ep_ret_sum),
                                   rtol=1e-4)


class TestPPO:
    """Vectorized clipped-PPO (algos/ppo.py)."""

    def _make(self, **kw):
        from deepmimic_mujoco_tpu.algos.ppo import PPO, PPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size,
                           fixed_logstd=kw.pop("fixed_logstd", None))
        cfg = PPOConfig(horizon=8, num_envs=4, epochs=2, minibatches=2, **kw)
        return PPO(env, policy, cfg)

    def test_iteration_finite_and_advances(self):
        learner = self._make()
        state = learner.init(jax.random.PRNGKey(0))
        state2, stats = learner.iteration(state)
        assert np.isfinite(float(stats.meankl))
        assert float(stats.timesteps) == 32
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["pol"], state2.params["pol"])
        assert max(jax.tree.leaves(moved)) > 0

    def test_fixed_logstd_frozen(self):
        learner = self._make(fixed_logstd=-1.0)
        state = learner.init(jax.random.PRNGKey(0))
        state2, _ = learner.iteration(state)
        np.testing.assert_allclose(np.asarray(state2.params["logstd"]), -1.0)

    def test_lr_decay_applied(self):
        learner = self._make(lr_decay=0.5)
        state = learner.init(jax.random.PRNGKey(0))
        state2, _ = learner.iteration(state)
        np.testing.assert_allclose(float(state2.lr_scale), 0.5)


@pytest.mark.slow
class TestAllClipsFiniteIteration:
    def test_one_trpo_iteration_every_clip(self):
        """Regression for the round-4 dance_a iter-0 NaN
        (chainlog/imit15.log: FloatingPointError non-finite meankl): one
        TRPO iteration on EVERY bundled clip must produce finite KL and
        parameters.  The pre-fix defective velocity tracks (euler-branch
        flips at 178 rad/s) made the first dance_a batch non-finite; the
        fixed tracks (MocapClip.qvel_fd) keep all 15 clips finite.  Runs
        as vmapped lanes of the multi-clip env — one compile, lane-local
        NaNs (the round-5 production trainer, tools/imitation15_vmapped.py,
        is this at scale)."""
        import dataclasses

        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs.multi_clip import DPEnvV3Multi
        from deepmimic_mujoco_tpu.mocap.registry import available_clips
        from deepmimic_mujoco_tpu.models import MlpPolicy
        from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range

        clips = tuple(sorted(c.replace("humanoid3d_", "")
                             for c in available_clips()))
        env = DPEnvV3Multi(
            clips=clips, model=mocap_hinge_range(),
            control_mode="pd_residual", n_substeps=2, max_episode_steps=50,
            reward_mode="imitation_dm", obs_mode="full",
            termination="fall_contact")
        policy = MlpPolicy(ob_dim=env.observation_size,
                           ac_dim=env.action_size, hidden_sizes=(32,),
                           fixed_logstd=-3.0)
        cfg = TRPOConfig(horizon=8, num_envs=2, g_step=1, cg_iters=3,
                         vf_iters=1, vf_batch_size=4,
                         reset_mode="rsi_pinned")
        learner = TRPO(env, policy, cfg)

        L, E = len(clips), cfg.num_envs
        lane_states = []
        for k in range(L):
            st = learner.init(jax.random.fold_in(jax.random.PRNGKey(0), k))
            ekeys = jax.random.split(jax.random.PRNGKey(100 + k), E)
            es = jax.vmap(lambda kk: env.reset_at(kk, k, 0))(ekeys)
            lane_states.append(dataclasses.replace(st, env_state=es))
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *lane_states)

        states, stats = jax.jit(jax.vmap(learner.iteration))(states)
        kl = np.asarray(stats.meankl)
        assert np.isfinite(kl).all(), (
            f"non-finite meankl lanes: "
            f"{[clips[i] for i in np.where(~np.isfinite(kl))[0]]}")
        flat = jax.flatten_util.ravel_pytree(states.params)[0]
        assert bool(jnp.isfinite(flat).all())
