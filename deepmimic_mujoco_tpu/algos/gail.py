"""GAIL — adversarial imitation on top of the TRPO core
(reference: /root/reference/src/gail.py).

Differences from plain TRPO (gail.py:78-87, 329-343):
* the rollout's learning signal is the discriminator reward
  ``−log(1−σ(D(ob,ac)))`` while the env's true reward is tracked separately
  for logging/episode stats;
* after the policy updates, the discriminator takes ``d_step`` minibatch
  updates pairing generator transitions with expert batches (Adam, lr 3e-4),
  updating its obs-RMS with the combined observations;
* defaults: timesteps_per_batch 1024, entcoeff 0 (gail.py:503-514).

Expert minibatches are drawn uniformly at random from the expert arrays
inside the jitted update (the reference uses a host-side sequential shuffle —
same distribution in expectation).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from deepmimic_mujoco_tpu.algos import adam
from deepmimic_mujoco_tpu.algos.adversary import TransitionClassifier
from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig, IterStats
from deepmimic_mujoco_tpu.models import distributions
from deepmimic_mujoco_tpu.parallel.collectives import maybe_pmean
from deepmimic_mujoco_tpu.utils import running_stats


class GAILConfig(NamedTuple):
    trpo: TRPOConfig = TRPOConfig(horizon=1024, num_envs=1)
    d_step: int = 1
    d_stepsize: float = 3e-4
    d_batches: int = 4      # minibatches per d_step (d_exact=False mode)
    # True = the reference's exact d-step semantics (gail.py:329-343): per
    # iteration, shuffle the policy batch and sweep it once in d_step
    # sequential minibatches of size n//d_step, pairing each with the next
    # sequential expert slice (Mujoco_Dset.get_next_batch pointer).
    # False = legacy r1 behaviour: d_step×d_batches random subsamples (same
    # distribution in expectation, different per-iteration coverage).
    d_exact: bool = True


@dataclasses.dataclass(frozen=True)
class GAILState:
    trpo: Any                 # TRPOState
    d_params: Any
    d_adam: adam.AdamState
    # sequential expert-batch cursor (Mujoco_Dset pointer, mujoco_dset.py
    # get_next_batch) — used by the d_exact mode
    expert_ptr: Any = 0


jax.tree_util.register_dataclass(
    GAILState, data_fields=["trpo", "d_params", "d_adam", "expert_ptr"],
    meta_fields=[])


class GAILStats(NamedTuple):
    trpo: IterStats
    d_loss: Any
    gen_acc: Any
    exp_acc: Any
    true_ep_ret_sum: Any
    # per-episode TRUE env returns (g_step, T, B), aligned with
    # trpo.ep_lens — the monitor logs true rewards while the learning
    # signal is the discriminator's (reference gail.py:78-87)
    true_ep_rets: Any = None


class GAIL:
    def __init__(self, env, policy, expert_obs, expert_acs,
                 config: GAILConfig = GAILConfig(),
                 adversary_hidden: int = 100, adversary_entcoeff: float = 1e-3,
                 axis_name: Optional[str] = None):
        self.cfg = config
        self.trpo = TRPO(env, policy, config.trpo, axis_name=axis_name)
        self.env = env
        self.policy = policy
        self.axis_name = axis_name
        self.disc = TransitionClassifier(
            ob_dim=env.observation_size, ac_dim=env.action_size,
            hidden_size=adversary_hidden, entcoeff=adversary_entcoeff,
        )
        self.expert_obs = jnp.asarray(expert_obs, jnp.float32)
        self.expert_acs = jnp.asarray(expert_acs, jnp.float32)

    def init(self, key) -> GAILState:
        k_t, k_d = jax.random.split(key)
        d_params = self.disc.init(k_d)
        n_d = jax.flatten_util.ravel_pytree(d_params["net"])[0].shape[0]
        return GAILState(
            trpo=self.trpo.init(k_t), d_params=d_params, d_adam=adam.init(n_d),
            expert_ptr=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _rollout_with_disc_reward(self, d_params, params, env_state, new0,
                                  key, ep_ret, ep_len):
        """Same segment semantics as TRPO._rollout but the stored reward is
        the discriminator's; episode accounting uses the TRUE env reward
        (gail.py:78-87)."""
        cfg = self.trpo.cfg

        def step_fn(carry, _):
            env_state, new, key, ep_ret, ep_len, true_ret = carry
            key, k_act = jax.random.split(key)
            ob = env_state.obs
            mean, logstd = self.policy.mean_logstd(params, ob)
            ks = jax.random.split(k_act, cfg.num_envs)
            ac = jax.vmap(distributions.diag_gaussian.sample)(ks, mean, logstd)
            vpred = self.policy.value(params, ob)
            rew = self.disc.reward(d_params, ob, ac)

            next_state = jax.vmap(self.env.step)(env_state, ac)
            true_rew = next_state.reward
            done = next_state.done

            ep_ret = ep_ret + rew
            ep_len = ep_len + 1
            true_ret = true_ret + true_rew
            ended_ret = jnp.where(done, ep_ret, 0.0)
            ended_len = jnp.where(done, ep_len, 0)
            ended_true = jnp.where(done, true_ret, 0.0)
            ep_ret = jnp.where(done, 0.0, ep_ret)
            ep_len = jnp.where(done, 0, ep_len)
            true_ret = jnp.where(done, 0.0, true_ret)

            from deepmimic_mujoco_tpu.algos.trpo import pick_reset_fn

            reset_fn = pick_reset_fn(self.env, self.cfg.trpo.reset_mode)
            k_resets = jax.vmap(lambda k: jax.random.split(k)[0])(next_state.key)
            fresh = jax.vmap(reset_fn)(k_resets)

            def pick(a, b):
                mask = done.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(mask, a, b)

            env_state2 = jax.tree.map(pick, fresh, next_state)
            out = (ob, ac, vpred, rew, new, ended_ret, ended_len, ended_true, done)
            return (env_state2, done, key, ep_ret, ep_len, true_ret), out

        B = cfg.num_envs
        true_ret0 = jnp.zeros(B, jnp.float32)
        carry0 = (env_state, new0, key, ep_ret, ep_len, true_ret0)
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=cfg.horizon)
        env_state, new_last, key, ep_ret, ep_len, _ = carry
        obs, acs, vpreds, rews, news, e_rets, e_lens, e_true, dones = traj
        nextvpred = self.policy.value(params, env_state.obs) * (
            1.0 - new_last.astype(jnp.float32))
        seg = dict(ob=obs, ac=acs, vpred=vpreds, rew=rews,
                   new=news.astype(jnp.float32), nextvpred=nextvpred,
                   ep_ret_sum=jnp.sum(e_rets), ep_len_sum=jnp.sum(e_lens),
                   ep_count=jnp.sum(e_lens > 0),
                   true_ep_ret_sum=jnp.sum(e_true),
                   # per-episode records (T, B): nonzero where an episode
                   # ENDED at that step — the host extracts true monitor
                   # rows (see IterStats.ep_rets)
                   ep_rets=e_rets, ep_lens=e_lens, ep_true=e_true)
        return seg, env_state, new_last, key, ep_ret, ep_len

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def iteration(self, state: GAILState) -> tuple[GAILState, GAILStats]:
        cfg = self.trpo.cfg
        t = state.trpo
        params, vf_adam = t.params, t.vf_adam
        env_state, new, key = t.env_state, t.new, t.key
        ep_ret, ep_len = t.cur_ep_ret, t.cur_ep_len
        d_params, d_adam = state.d_params, state.d_adam

        ep_ret_sum = jnp.zeros((), jnp.float32)
        ep_len_sum = jnp.zeros((), jnp.float32)
        ep_count = jnp.zeros((), jnp.float32)
        true_sum = jnp.zeros((), jnp.float32)
        ep_len_sum_last = jnp.zeros((), jnp.float32)
        meanlosses = jnp.zeros(5, jnp.float32)
        ev = jnp.zeros((), jnp.float32)
        last_ob = None
        last_ac = None
        ep_rets_all, ep_lens_all, ep_true_all = [], [], []

        for _ in range(cfg.g_step):
            seg, env_state, new, key, ep_ret, ep_len = \
                self._rollout_with_disc_reward(
                    d_params, params, env_state, new, key, ep_ret, ep_len)
            params, vf_adam, meanlosses, ev, key = self.trpo._segment_update(
                params, vf_adam, seg, key)
            ep_ret_sum += seg["ep_ret_sum"]
            ep_len_sum += seg["ep_len_sum"]
            ep_count += seg["ep_count"].astype(jnp.float32)
            true_sum += seg["true_ep_ret_sum"]
            ep_len_sum_last = seg["ep_len_sum"]
            last_ob = seg["ob"].reshape(-1, seg["ob"].shape[-1])
            last_ac = seg["ac"].reshape(-1, seg["ac"].shape[-1])
            ep_rets_all.append(seg["ep_rets"])
            ep_lens_all.append(seg["ep_lens"])
            ep_true_all.append(seg["ep_true"])

        # ---- discriminator updates (gail.py:329-343) ----
        d_flat, d_unravel = jax.flatten_util.ravel_pytree(d_params["net"])
        n = last_ob.shape[0]
        n_exp = self.expert_obs.shape[0]
        expert_ptr = state.expert_ptr

        def d_loss_fn(theta, obs_rms, g_ob, g_ac, e_ob, e_ac):
            p = {"net": d_unravel(theta), "obs_rms": obs_rms}
            total, metrics = self.disc.loss(p, g_ob, g_ac, e_ob, e_ac)
            return total, metrics

        def d_minibatch(carry, idx_pair):
            d_flat, d_adam, obs_rms = carry
            g_idx, e_idx = idx_pair
            g_ob, g_ac = last_ob[g_idx], last_ac[g_idx]
            e_ob, e_ac = self.expert_obs[e_idx], self.expert_acs[e_idx]
            obs_rms = running_stats.update(
                obs_rms, jnp.concatenate([g_ob, e_ob], axis=0))
            (loss, metrics), grad = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_flat, obs_rms, g_ob, g_ac, e_ob, e_ac)
            grad = maybe_pmean(grad, self.axis_name)
            d_flat, d_adam = adam.update(d_adam, grad, d_flat, self.cfg.d_stepsize)
            return (d_flat, d_adam, obs_rms), (loss, metrics["generator_acc"],
                                               metrics["expert_acc"])

        key, k_d = jax.random.split(key)
        if self.cfg.d_exact:
            # EXACT reference semantics (gail.py:334-343): shuffle the whole
            # policy batch, sweep it once in d_step sequential minibatches of
            # n//d_step; expert batches advance a sequential cursor
            # (Mujoco_Dset.get_next_batch) with wraparound
            mb = max(1, n // self.cfg.d_step)
            n_mb = self.cfg.d_step
            perm = jax.random.permutation(k_d, n)
            g_idx = perm[: n_mb * mb].reshape(n_mb, mb)
            e_idx = (expert_ptr
                     + jnp.arange(n_mb * mb).reshape(n_mb, mb)) % n_exp
            expert_ptr = (expert_ptr + n_mb * mb) % n_exp
        else:
            # legacy r1 mode: d_step×d_batches random subsamples
            mb = max(1, n // self.cfg.d_batches)
            n_mb = self.cfg.d_step * self.cfg.d_batches
            ks = jax.random.split(k_d, 2 * n_mb)
            g_idx = jax.vmap(
                lambda k: jax.random.choice(k, n, (mb,), replace=False)
            )(ks[:n_mb])
            e_idx = jax.vmap(
                lambda k: jax.random.choice(k, n_exp, (mb,), replace=True)
            )(ks[n_mb:])
        (d_flat, d_adam, d_obs_rms), (d_losses, g_accs, e_accs) = jax.lax.scan(
            d_minibatch, (d_flat, d_adam, d_params["obs_rms"]),
            (g_idx, e_idx))
        d_params = {"net": d_unravel(d_flat), "obs_rms": d_obs_rms}

        from deepmimic_mujoco_tpu.algos.trpo import TRPOState

        new_trpo = TRPOState(
            params=params, vf_adam=vf_adam, env_state=env_state, new=new,
            key=key, cur_ep_ret=ep_ret, cur_ep_len=ep_len)
        stats = GAILStats(
            trpo=IterStats(
                optimgain=meanlosses[0], meankl=meanlosses[1],
                entloss=meanlosses[2], surrgain=meanlosses[3],
                entropy=meanlosses[4], ev_tdlam_before=ev,
                ep_ret_sum=ep_ret_sum, ep_len_sum=ep_len_sum, ep_count=ep_count,
                timesteps=jnp.asarray(
                    cfg.g_step * cfg.horizon * cfg.num_envs, jnp.float32),
                ep_len_sum_last=ep_len_sum_last,
                ep_rets=jnp.stack(ep_rets_all),
                ep_lens=jnp.stack(ep_lens_all),
            ),
            d_loss=jnp.mean(d_losses), gen_acc=jnp.mean(g_accs),
            exp_acc=jnp.mean(e_accs), true_ep_ret_sum=true_sum,
            true_ep_rets=jnp.stack(ep_true_all),
        )
        return GAILState(trpo=new_trpo, d_params=d_params, d_adam=d_adam,
                         expert_ptr=expert_ptr), stats
