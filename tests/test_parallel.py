"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(replaces the reference's mpirun-based distributed testing; SURVEY.md §4)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), ("env",))


class TestCollectives:
    def test_pmean_matches_mean(self, mesh):
        from jax.experimental.shard_map import shard_map

        x = jnp.arange(8.0)

        def f(x):
            return jax.lax.pmean(x, "env")

        out = shard_map(f, mesh=mesh, in_specs=P("env"), out_specs=P("env"))(x)
        np.testing.assert_allclose(np.asarray(out), 3.5)

    def test_sync_check_detects_divergence(self, mesh):
        from jax.experimental.shard_map import shard_map

        from deepmimic_mujoco_tpu.parallel.collectives import sync_check

        def f(params, opt):
            return sync_check(params, opt, "env")[None]

        same_p = jnp.ones(16)
        same_o = jnp.ones(16)
        ok = shard_map(f, mesh=mesh, in_specs=(P("env"), P("env")),
                       out_specs=P("env"))(same_p, same_o)
        assert bool(np.all(np.asarray(ok)))

        div_p = jnp.arange(16.0) * 100  # different sums per shard
        bad = shard_map(f, mesh=mesh, in_specs=(P("env"), P("env")),
                        out_specs=P("env"))(div_p, same_o)
        assert not bool(np.all(np.asarray(bad)))


class TestShardedTraining:
    def test_trpo_step_sharded_over_mesh(self, mesh):
        """Full TRPO iteration with env state sharded over 8 devices —
        the dryrun_multichip path as a pytest."""
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        cfg = TRPOConfig(horizon=2, num_envs=16, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        learner = TRPO(env, policy, cfg)
        state = learner.init(jax.random.PRNGKey(0))

        env_sh = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        place = lambda t, s: jax.tree.map(lambda x: jax.device_put(x, s), t)
        state = dataclasses.replace(
            state,
            params=place(state.params, repl),
            vf_adam=place(state.vf_adam, repl),
            env_state=place(state.env_state, env_sh),
            new=jax.device_put(state.new, env_sh),
            key=jax.device_put(state.key, repl),
            cur_ep_ret=jax.device_put(state.cur_ep_ret, env_sh),
            cur_ep_len=jax.device_put(state.cur_ep_len, env_sh),
        )
        with mesh:
            state2, stats = learner.iteration(state)
            jax.block_until_ready(state2.params)
        assert np.isfinite(float(stats.meankl))
        flat = jax.flatten_util.ravel_pytree(state2.params)[0]
        assert bool(jnp.isfinite(flat).all())



    def test_ppo_step_sharded_over_mesh(self, mesh):
        """Full PPO iteration with env state sharded over 8 devices."""
        from deepmimic_mujoco_tpu.algos.ppo import PPO, PPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        cfg = PPOConfig(horizon=2, num_envs=16, epochs=1, minibatches=2)
        learner = PPO(env, policy, cfg)
        state = learner.init(jax.random.PRNGKey(0))

        env_sh = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        place = lambda t, s: jax.tree.map(lambda x: jax.device_put(x, s), t)
        state = dataclasses.replace(
            state,
            params=place(state.params, repl),
            opt=place(state.opt, repl),
            env_state=place(state.env_state, env_sh),
            new=jax.device_put(state.new, env_sh),
            key=jax.device_put(state.key, repl),
            cur_ep_ret=jax.device_put(state.cur_ep_ret, env_sh),
            cur_ep_len=jax.device_put(state.cur_ep_len, env_sh),
            lr_scale=jax.device_put(state.lr_scale, repl),
        )
        with mesh:
            state2, stats = learner.iteration(state)
            jax.block_until_ready(state2.params)
        assert np.isfinite(float(stats.meankl))
        flat = jax.flatten_util.ravel_pytree(state2.params)[0]
        assert bool(jnp.isfinite(flat).all())

    def test_sharded_matches_single_device(self, mesh):
        """Same seed, same config: sharded and unsharded iterations produce
        the same parameters (the reference's replica-consistency invariant,
        trpo.py:285-287, as an actual equality test)."""
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        cfg = TRPOConfig(horizon=2, num_envs=8, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        learner = TRPO(env, policy, cfg)

        outs = []
        for shard in (False, True):
            state = learner.init(jax.random.PRNGKey(5))
            if shard:
                env_sh = NamedSharding(mesh, P("env"))
                state = dataclasses.replace(
                    state,
                    env_state=jax.tree.map(
                        lambda x: jax.device_put(x, env_sh), state.env_state),
                    new=jax.device_put(state.new, env_sh),
                    cur_ep_ret=jax.device_put(state.cur_ep_ret, env_sh),
                    cur_ep_len=jax.device_put(state.cur_ep_len, env_sh),
                )
                with mesh:
                    state2, _ = learner.iteration(state)
            else:
                state2, _ = learner.iteration(state)
            outs.append(np.asarray(
                jax.flatten_util.ravel_pytree(state2.params)[0]))
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-5)


class TestExplicitCollectives:
    """The maybe_pmean/all_gather branches driven end-to-end through the
    real TRPO update under shard_map with axis_name='env' — the explicit-
    collective path the reference implements with MPI Allreduce
    (trpo.py:175-188, mpi_adam.py:21-50)."""

    def _toy_policy_and_seg(self, T=6, B=4, ob_dim=5, ac_dim=3, seed=0):
        from deepmimic_mujoco_tpu.models import MlpPolicy

        policy = MlpPolicy(ob_dim=ob_dim, ac_dim=ac_dim, hid_size=8,
                           num_hid_layers=1)
        rng = np.random.RandomState(seed)
        seg = dict(
            ob=jnp.asarray(rng.randn(T, B, ob_dim), jnp.float32),
            ac=jnp.asarray(rng.randn(T, B, ac_dim) * 0.1, jnp.float32),
            vpred=jnp.asarray(rng.randn(T, B) * 0.1, jnp.float32),
            rew=jnp.asarray(rng.rand(T, B), jnp.float32),
            new=jnp.asarray(rng.rand(T, B) < 0.2, jnp.float32),
            nextvpred=jnp.asarray(rng.randn(B) * 0.1, jnp.float32),
        )
        return policy, seg

    def test_segment_update_explicit_pmean_matches_unsharded(self, mesh):
        """Identical segment replicated to every shard: the explicit-pmean
        update must produce exactly the unsharded parameters (pmean of
        identical grads is the identity)."""
        from jax.experimental.shard_map import shard_map

        from deepmimic_mujoco_tpu.algos import adam
        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig

        policy, seg = self._toy_policy_and_seg()
        cfg = TRPOConfig(horizon=6, num_envs=4, g_step=1, cg_iters=3,
                         vf_iters=1, vf_batch_size=4, line_search_steps=3)
        base = TRPO(env=None, policy=policy, config=cfg, axis_name=None)
        expl = TRPO(env=None, policy=policy, config=cfg, axis_name="env")

        params = policy.init(jax.random.PRNGKey(0))
        n_vf = jax.flatten_util.ravel_pytree(params["vf"])[0].shape[0]
        vf_adam = adam.init(n_vf)
        key = jax.random.PRNGKey(1)

        p_ref, _, losses_ref, _, _ = jax.jit(base._segment_update)(
            params, vf_adam, seg, key)

        def trained_leaves(p):
            # exclude the rms count/sum accumulators: psum over replicated
            # data legitimately counts it once per shard (mean/std cancel)
            return jax.flatten_util.ravel_pytree({
                "pol": p["pol"], "vf": p["vf"], "logstd": p["logstd"],
                "mean": p["ob_rms"].mean, "std": p["ob_rms"].std,
            })[0]

        def body(params, vf_adam, seg, key):
            p, _, losses, _, _ = expl._segment_update(
                params, vf_adam, seg, key)
            # stack per-shard results so the host can assert replica equality
            return trained_leaves(p)[None], losses[None]

        flats, losses = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P("env"), P("env")),
            check_rep=False,
        )(params, vf_adam, seg, key)
        flats = np.asarray(flats)
        # every replica identical ...
        for r in range(1, flats.shape[0]):
            np.testing.assert_allclose(flats[r], flats[0], atol=1e-6)
        # ... and equal to the unsharded result
        ref = np.asarray(trained_leaves(p_ref))
        # shard_map compiles different reduction orders; CG amplifies the
        # f32 noise — equivalence, not bitwise equality, is the contract
        np.testing.assert_allclose(flats[0], ref, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(losses[0]),
                                   np.asarray(losses_ref), atol=1e-3)

    def test_full_iteration_explicit_shard_map(self, mesh):
        """A whole TRPO iteration (rollout + update) inside shard_map with
        axis_name='env': 2 local envs per device, replicas must emerge
        bitwise-identical (the reference's every-20-iters allgather assert,
        trpo.py:285-287)."""
        import dataclasses

        from jax.experimental.shard_map import shard_map

        from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig, TRPOState
        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.models import MlpPolicy

        env = DPEnvV3(clip="walk")
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        # cfg.num_envs is the per-shard count under explicit SPMD
        cfg = TRPOConfig(horizon=2, num_envs=2, g_step=1, cg_iters=2,
                         vf_iters=1, vf_batch_size=4, line_search_steps=2)
        expl = TRPO(env, policy, cfg, axis_name="env")

        # build a GLOBAL 16-env state, shard it 2-per-device
        glob = TRPO(env, policy, cfg._replace(num_envs=16))
        state = glob.init(jax.random.PRNGKey(0))

        def body(state):
            state2, stats = expl.iteration(state)
            flat = jax.flatten_util.ravel_pytree(state2.params)[0]
            return flat[None], stats.meankl[None]

        spec_state = TRPOState(
            params=P(), vf_adam=P(), env_state=P("env"), new=P("env"),
            key=P(), cur_ep_ret=P("env"), cur_ep_len=P("env"))
        flats, kls = shard_map(
            body, mesh=mesh, in_specs=(spec_state,),
            out_specs=(P("env"), P("env")), check_rep=False)(state)
        flats = np.asarray(flats)
        assert np.isfinite(flats).all()
        assert np.isfinite(np.asarray(kls)).all()
        for r in range(1, flats.shape[0]):
            np.testing.assert_allclose(flats[r], flats[0], atol=1e-6)


class TestShareBytes:
    def test_single_process_identity(self):
        from deepmimic_mujoco_tpu.parallel.collectives import share_bytes

        assert share_bytes(b"checkpoint-blob") == b"checkpoint-blob"

    def test_share_file_roundtrip(self, tmp_path):
        from deepmimic_mujoco_tpu.parallel.collectives import share_file

        p = tmp_path / "ckpt.bin"
        p.write_bytes(b"\x00\x01payload")
        share_file(str(p))
        assert p.read_bytes() == b"\x00\x01payload"
