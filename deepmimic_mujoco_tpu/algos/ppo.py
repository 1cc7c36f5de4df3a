"""Vectorized clipped-surrogate PPO — one jitted iteration over a vmapped
env batch.

The reference's PPO lives in its original-DeepMimic stack
(/root/reference/src/dp_policy_testing/learning/ppo_agent.py: clipped ratio
0.2, minibatch epochs, momentum solvers); this is the same algorithm family
re-designed like :mod:`algos.trpo` — rollout (lax.scan over vmapped envs) →
GAE(λ) → K epochs of shuffled-minibatch Adam on
``L_clip + vf_coef·L_vf − ent_coef·H`` with global grad-norm clipping.
Parameters replicated / envs sharded under SPMD; every gradient is
``pmean``-reduced like the reference's MPI solvers (mpi_solver.py:40-54).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from deepmimic_mujoco_tpu.algos import adam
from deepmimic_mujoco_tpu.algos.gae import add_vtarg_and_adv
from deepmimic_mujoco_tpu.algos.trpo import IterStats, pick_reset_fn
from deepmimic_mujoco_tpu.models import distributions
from deepmimic_mujoco_tpu.parallel.collectives import maybe_pmean


class PPOConfig(NamedTuple):
    horizon: int = 64
    num_envs: int = 256
    gamma: float = 0.95
    lam: float = 0.95
    clip_ratio: float = 0.2
    epochs: int = 4
    minibatches: int = 8
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    reset_mode: str = "noise"
    # anneal lr multiplicatively per iteration (1.0 = off)
    lr_decay: float = 1.0


@dataclasses.dataclass(frozen=True)
class PPOState:
    params: Any
    opt: adam.AdamState
    env_state: Any
    new: Any
    key: Any
    cur_ep_ret: Any
    cur_ep_len: Any
    lr_scale: Any


jax.tree_util.register_dataclass(
    PPOState,
    data_fields=["params", "opt", "env_state", "new", "key",
                 "cur_ep_ret", "cur_ep_len", "lr_scale"],
    meta_fields=[],
)


class PPO:
    """Couples a functional env and an MlpPolicy with the PPO update."""

    def __init__(self, env, policy, config: PPOConfig = PPOConfig(),
                 axis_name: Optional[str] = None):
        self.env = env
        self.policy = policy
        self.cfg = config
        self.axis_name = axis_name

    def init(self, key) -> PPOState:
        k_pi, k_env, key = jax.random.split(key, 3)
        params = self.policy.init(k_pi)
        flat, _ = jax.flatten_util.ravel_pytree(
            {"pol": params["pol"], "vf": params["vf"],
             "logstd": params["logstd"]})
        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        env_state = jax.vmap(self.env.reset)(env_keys)
        B = self.cfg.num_envs
        return PPOState(
            params=params, opt=adam.init(flat.shape[0]),
            env_state=env_state, new=jnp.ones(B, bool), key=key,
            cur_ep_ret=jnp.zeros(B, jnp.float32),
            cur_ep_len=jnp.zeros(B, jnp.int32),
            lr_scale=jnp.ones((), jnp.float32),
        )

    # ------------------------------------------------------------------
    def _rollout(self, params, env_state, new0, key, ep_ret, ep_len):
        cfg = self.cfg
        reset_fn = pick_reset_fn(self.env, cfg.reset_mode)

        def step_fn(carry, _):
            env_state, new, key, ep_ret, ep_len = carry
            key, k_act = jax.random.split(key)
            ob = env_state.obs
            mean, logstd = self.policy.mean_logstd(params, ob)
            k_acts = jax.random.split(k_act, cfg.num_envs)
            ac = jax.vmap(distributions.diag_gaussian.sample)(
                k_acts, mean, logstd)
            neglogp = distributions.diag_gaussian.neglogp(mean, logstd, ac)
            vpred = self.policy.value(params, ob)

            next_state = jax.vmap(self.env.step)(env_state, ac)
            rew = next_state.reward
            done = next_state.done

            ep_ret = ep_ret + rew
            ep_len = ep_len + 1
            ended_ret = jnp.where(done, ep_ret, 0.0)
            ended_len = jnp.where(done, ep_len, 0)
            ep_ret = jnp.where(done, 0.0, ep_ret)
            ep_len = jnp.where(done, 0, ep_len)

            k_resets = jax.vmap(lambda k: jax.random.split(k)[0])(
                next_state.key)
            fresh = jax.vmap(reset_fn)(k_resets)

            def pick(a, b):
                mask = done.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(mask, a, b)

            env_state2 = jax.tree.map(pick, fresh, next_state)
            out = (ob, ac, neglogp, vpred, rew, new, ended_ret, ended_len)
            return (env_state2, done, key, ep_ret, ep_len), out

        carry0 = (env_state, new0, key, ep_ret, ep_len)
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=cfg.horizon)
        env_state, new_last, key, ep_ret, ep_len = carry
        obs, acs, nlps, vpreds, rews, news, e_rets, e_lens = traj
        nextvpred = self.policy.value(params, env_state.obs) * (
            1.0 - new_last.astype(jnp.float32))
        seg = dict(ob=obs, ac=acs, neglogp=nlps, vpred=vpreds, rew=rews,
                   new=news.astype(jnp.float32), nextvpred=nextvpred,
                   ep_ret_sum=jnp.sum(e_rets), ep_len_sum=jnp.sum(e_lens),
                   ep_count=jnp.sum(e_lens > 0),
                   ep_rets=e_rets, ep_lens=e_lens)
        return seg, env_state, new_last, key, ep_ret, ep_len

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def iteration(self, state: PPOState) -> tuple[PPOState, IterStats]:
        cfg = self.cfg
        pmean = lambda x: maybe_pmean(x, self.axis_name)
        params = state.params

        seg, env_state, new, key, ep_ret, ep_len = self._rollout(
            params, state.env_state, state.new, state.key,
            state.cur_ep_ret, state.cur_ep_len)

        ob = seg["ob"].reshape(-1, seg["ob"].shape[-1])
        ac = seg["ac"].reshape(-1, seg["ac"].shape[-1])
        nlp_old = seg["neglogp"].reshape(-1)
        adv, tdlamret = add_vtarg_and_adv(
            seg["rew"], seg["vpred"], seg["new"], seg["nextvpred"],
            cfg.gamma, cfg.lam)
        adv = adv.reshape(-1)
        ret = tdlamret.reshape(-1)
        vpredbefore = seg["vpred"].reshape(-1)

        params = self.policy.update_ob_rms(params, ob, self.axis_name)
        # recompute the old-policy neglogp under the UPDATED obs-rms: the
        # rollout recorded it under the old normalization, and loss_fn
        # normalizes with the new one — without this, ratio≠1 at unchanged
        # params and the clip objective treats the rms shift as a policy
        # change (the TRPO path's params_old snapshot has the same effect)
        nlp_old = self.policy.neglogp(params, ob, ac)

        train_tree = {"pol": params["pol"], "vf": params["vf"],
                      "logstd": params["logstd"]}
        flat, unravel = jax.flatten_util.ravel_pytree(train_tree)
        fixed_logstd = getattr(self.policy, "fixed_logstd", None)
        if fixed_logstd is not None:
            mask, _ = jax.flatten_util.ravel_pytree({
                "pol": jax.tree.map(jnp.ones_like, train_tree["pol"]),
                "vf": jax.tree.map(jnp.ones_like, train_tree["vf"]),
                "logstd": jnp.zeros_like(train_tree["logstd"]),
            })
        else:
            mask = None

        def with_theta(theta):
            t = unravel(theta)
            return {**params, **t}

        def loss_fn(theta, mb_ob, mb_ac, mb_adv, mb_ret, mb_nlp_old):
            p = with_theta(theta)
            mean, logstd = self.policy.mean_logstd(p, mb_ob)
            nlp = distributions.diag_gaussian.neglogp(mean, logstd, mb_ac)
            ratio = jnp.exp(mb_nlp_old - nlp)
            a = (mb_adv - mb_adv.mean()) / (mb_adv.std() + 1e-8)
            clipped = jnp.clip(ratio, 1.0 - cfg.clip_ratio,
                               1.0 + cfg.clip_ratio)
            pg_loss = -jnp.mean(jnp.minimum(ratio * a, clipped * a))
            v = self.policy.value(p, mb_ob)
            vf_loss = jnp.mean(jnp.square(v - mb_ret))
            ent = jnp.mean(distributions.diag_gaussian.entropy(logstd))
            loss = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * ent
            clipfrac = jnp.mean(
                (jnp.abs(ratio - 1.0) > cfg.clip_ratio).astype(jnp.float32))
            kl = jnp.mean(nlp - mb_nlp_old)  # E[log(old/new)] estimator
            return loss, (pg_loss, vf_loss, ent, clipfrac, kl)

        n = ob.shape[0]
        mb_size = n // cfg.minibatches
        lr = cfg.lr * state.lr_scale

        def epoch(carry, k_ep):
            theta, opt = carry
            perm = jax.random.permutation(k_ep, n)
            idx = perm[: cfg.minibatches * mb_size].reshape(
                cfg.minibatches, mb_size)

            def mb_step(c, i):
                theta, opt = c
                (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    theta, ob[i], ac[i], adv[i], ret[i], nlp_old[i])
                g = pmean(g)
                # mask frozen-logstd coordinates BEFORE the global-norm
                # clip, so the clip norm doesn't include components that are
                # then discarded (which would systematically shrink the
                # effective step; TRPO masks g before CG the same way)
                if mask is not None:
                    g = g * mask
                gnorm = jnp.linalg.norm(g)
                g = g * jnp.minimum(1.0, cfg.max_grad_norm /
                                    jnp.maximum(gnorm, 1e-8))
                theta, opt = adam.update(opt, g, theta, lr)
                return (theta, opt), aux

            (theta, opt), aux = jax.lax.scan(mb_step, (theta, opt), idx)
            return (theta, opt), aux

        key, k_tr = jax.random.split(key)
        ep_keys = jax.random.split(k_tr, cfg.epochs)
        (flat, opt), aux = jax.lax.scan(epoch, (flat, state.opt), ep_keys)
        pg_l, vf_l, ent, clipfrac, kl = (a[-1, -1] for a in aux)
        params = {**params, **unravel(flat)}

        from deepmimic_mujoco_tpu.utils.math import explained_variance

        stats = IterStats(
            optimgain=-pg_l, meankl=kl, entloss=-cfg.ent_coef * ent,
            surrgain=-pg_l, entropy=ent,
            ev_tdlam_before=explained_variance(vpredbefore, ret),
            ep_ret_sum=seg["ep_ret_sum"], ep_len_sum=seg["ep_len_sum"],
            ep_count=seg["ep_count"].astype(jnp.float32),
            timesteps=jnp.asarray(cfg.horizon * cfg.num_envs, jnp.float32),
            ep_len_sum_last=seg["ep_len_sum"],
            ep_rets=seg["ep_rets"][None], ep_lens=seg["ep_lens"][None],
        )
        new_state = PPOState(
            params=params, opt=opt, env_state=env_state, new=new, key=key,
            cur_ep_ret=ep_ret, cur_ep_len=ep_len,
            lr_scale=state.lr_scale * cfg.lr_decay,
        )
        return new_state, stats
