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
