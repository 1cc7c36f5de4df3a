"""TRPO learner — the reference's MPI-parallel TRPO
(/root/reference/src/trpo.py:97-319) re-designed as a single jitted SPMD
program.

One ``iteration()`` = (for each of ``g_step`` segments): batched rollout via
``lax.scan`` over vmapped envs → GAE(λ) → obs-RMS update → policy gradient →
CG on the KL Fisher-vector product (double-vjp) → KL line search
(``lax.while_loop``, ≤10 halvings) → ``vf_iters`` epochs of minibatch Adam on
the value function.  Every ``allmean`` in the reference is a ``pmean`` here;
parameters are replicated, envs sharded.

Semantics preserved (SURVEY.md §7 quirks):
* segments cross episode boundaries; ``new`` flags + nextvpred·(1−new)
  bootstrap exactly as trpo.py:50-53
* post-done resets are *noise* resets (trpo.py:78-79)
* advantages standardized without ε (trpo.py:240)
* FVP subsamples every 5th row (trpo.py:245)
* obs-RMS updated on the full segment AND again on every vf minibatch
  (trpo.py:242,292-293)
* vf minibatch size 128, final partial batch dropped (trpo.py:290-291)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from deepmimic_mujoco_tpu.algos import adam
from deepmimic_mujoco_tpu.algos.cg import cg
from deepmimic_mujoco_tpu.algos.gae import add_vtarg_and_adv
from deepmimic_mujoco_tpu.models import distributions
from deepmimic_mujoco_tpu.parallel.collectives import maybe_pmean
from deepmimic_mujoco_tpu.utils import running_stats
from deepmimic_mujoco_tpu.utils.math import explained_variance


class TRPOConfig(NamedTuple):
    """Defaults = the reference's train() hyperparams (trpo.py:338-354,507-515)."""

    horizon: int = 256            # timesteps_per_batch per env
    num_envs: int = 8             # replaces the 8 MPI workers
    g_step: int = 3
    gamma: float = 0.995
    lam: float = 0.97
    max_kl: float = 0.01
    cg_iters: int = 10
    cg_damping: float = 0.1
    vf_iters: int = 3
    vf_stepsize: float = 1e-3
    vf_batch_size: int = 128
    entcoeff: float = 0.0
    line_search_steps: int = 10
    # post-done reset: "noise" = reference behaviour (reset_model_init,
    # trpo.py:78-79); "rsi" = reference-state initialization from a random
    # mocap frame (DeepMimic-proper; required for imitation training)
    reset_mode: str = "noise"


@dataclasses.dataclass(frozen=True)
class TRPOState:
    params: Any               # policy param pytree (pol/vf/logstd/ob_rms)
    vf_adam: adam.AdamState
    env_state: Any            # batched EnvState
    new: Any                  # (num_envs,) episode-start flags for next obs
    key: Any
    # episode accounting (running, per env)
    cur_ep_ret: Any
    cur_ep_len: Any


jax.tree_util.register_dataclass(
    TRPOState,
    data_fields=["params", "vf_adam", "env_state", "new", "key",
                 "cur_ep_ret", "cur_ep_len"],
    meta_fields=[],
)


class IterStats(NamedTuple):
    optimgain: Any
    meankl: Any
    entloss: Any
    surrgain: Any
    entropy: Any
    ev_tdlam_before: Any
    # episode stats collected during sampling: sum of returns/lengths of
    # episodes that ended, and their count (use to update rolling buffers)
    ep_ret_sum: Any
    ep_len_sum: Any
    ep_count: Any
    timesteps: Any
    # reference-compatible step counter: the reference's timesteps_so_far
    # only counts episodes that completed during the LAST of the g_step
    # segments (trpo.py:310-311 reads seg["ep_lens"] of the final seg), so
    # its x-axis undercounts sampled steps ~g_step·horizon/Σlens-fold.
    ep_len_sum_last: Any
    # per-episode records (g_step, T, B): nonzero entries are the return /
    # length of an episode that ENDED at that step — the host extracts true
    # per-episode rows for the monitor (reference bench/monitor.py:58-76
    # records one CSV row per episode, not per iteration)
    ep_rets: Any = None
    ep_lens: Any = None


def _policy_leaves(params):
    return {"pol": params["pol"], "logstd": params["logstd"]}


def pick_reset_fn(env, reset_mode: str):
    """Episode-start reset for a given mode: "rsi" = random mocap frame;
    "noise" = the v3 noise reset (reference trpo.py:78-79), falling back to
    the env's mocap reset when it has none (v1/v2 — the reference's own
    trainer only supports v3 there, trpo.py:79)."""
    if reset_mode == "rsi":
        return env.reset
    return getattr(env, "reset_init", env.reset)


class TRPO:
    """Couples a functional env (DPEnvV3-style), an MlpPolicy, and the TRPO
    update.  ``axis_name`` enables multi-device SPMD (pmean collectives)."""

    def __init__(self, env, policy, config: TRPOConfig = TRPOConfig(),
                 axis_name: Optional[str] = None):
        self.env = env
        self.policy = policy
        self.cfg = config
        self.axis_name = axis_name

    # ------------------------------------------------------------------
    def init(self, key) -> TRPOState:
        k_pi, k_env, key = jax.random.split(key, 3)
        params = self.policy.init(k_pi)
        n_vf = jax.flatten_util.ravel_pytree(params["vf"])[0].shape[0]
        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        env_state = jax.vmap(self.env.reset)(env_keys)
        B = self.cfg.num_envs
        return TRPOState(
            params=params,
            vf_adam=adam.init(n_vf),
            env_state=env_state,
            new=jnp.ones(B, bool),
            key=key,
            cur_ep_ret=jnp.zeros(B, jnp.float32),
            cur_ep_len=jnp.zeros(B, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _rollout(self, params, env_state, new0, key, cur_ep_ret, cur_ep_len):
        """Fixed-horizon segment across episode boundaries
        (traj_segment_generator, trpo.py:27-80).  Shapes: (T, B, ...)."""
        cfg = self.cfg

        def step_fn(carry, _):
            env_state, new, key, ep_ret, ep_len = carry
            key, k_act = jax.random.split(key)
            ob = env_state.obs
            mean, logstd = self.policy.mean_logstd(params, ob)
            k_acts = jax.random.split(k_act, cfg.num_envs)
            ac = jax.vmap(distributions.diag_gaussian.sample)(k_acts, mean, logstd)
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

            # auto-reset finished envs: noise reset (trpo.py:78-79) or RSI
            k_resets = jax.vmap(lambda k: jax.random.split(k)[0])(next_state.key)
            if cfg.reset_mode == "rsi_pinned":
                # RSI that keeps each env's current clip — lanes of
                # independent per-skill learners stay on their skill
                fresh = jax.vmap(self.env.reset_keep_clip)(
                    k_resets, next_state)
            else:
                reset_fn = pick_reset_fn(self.env, cfg.reset_mode)
                fresh = jax.vmap(reset_fn)(k_resets)

            def pick(a, b):
                mask = done.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(mask, a, b)

            env_state2 = jax.tree.map(pick, fresh, next_state)

            out = (ob, ac, vpred, rew, new, ended_ret, ended_len, done)
            return (env_state2, done, key, ep_ret, ep_len), out

        from deepmimic_mujoco_tpu.utils.unroll import unroll_for

        carry0 = (env_state, new0, key, cur_ep_ret, cur_ep_len)
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=cfg.horizon,
                                   unroll=unroll_for("horizon", cfg.horizon))
        env_state, new_last, key, ep_ret, ep_len = carry
        obs, acs, vpreds, rews, news, e_rets, e_lens, dones = traj
        nextvpred = self.policy.value(params, env_state.obs) * (
            1.0 - new_last.astype(jnp.float32))
        seg = dict(ob=obs, ac=acs, vpred=vpreds, rew=rews,
                   new=news.astype(jnp.float32), nextvpred=nextvpred,
                   ep_ret_sum=jnp.sum(e_rets), ep_len_sum=jnp.sum(e_lens),
                   ep_count=jnp.sum(e_lens > 0),
                   ep_rets=e_rets, ep_lens=e_lens)
        return seg, env_state, new_last, key, ep_ret, ep_len

    # ------------------------------------------------------------------
    def _losses(self, params, params_old, ob, ac, atarg):
        """[optimgain, meankl, entbonus, surrgain, meanent] (trpo.py:121-134)."""
        cfg = self.cfg
        kl = self.policy.kl(params_old, params, ob)
        meankl = jnp.mean(kl)
        ent = self.policy.entropy(params, ob)
        meanent = jnp.mean(ent)
        entbonus = cfg.entcoeff * meanent
        logp_new = -self.policy.neglogp(params, ob, ac)
        logp_old = -self.policy.neglogp(params_old, ob, ac)
        ratio = jnp.exp(logp_new - logp_old)
        surrgain = jnp.mean(ratio * atarg)
        optimgain = surrgain + entbonus
        return jnp.stack([optimgain, meankl, entbonus, surrgain, meanent])

    def _segment_update(self, params, vf_adam, seg, key):
        """One TRPO policy+vf update from one segment (trpo.py:236-295)."""
        cfg = self.cfg
        pmean = lambda x: maybe_pmean(x, self.axis_name)

        ob = seg["ob"].reshape(-1, seg["ob"].shape[-1])
        ac = seg["ac"].reshape(-1, seg["ac"].shape[-1])
        adv, tdlamret = add_vtarg_and_adv(
            seg["rew"], seg["vpred"], seg["new"], seg["nextvpred"],
            cfg.gamma, cfg.lam,
        )
        adv = adv.reshape(-1)
        tdlamret = tdlamret.reshape(-1)
        vpredbefore = seg["vpred"].reshape(-1)
        atarg = (adv - adv.mean()) / adv.std()  # no epsilon (trpo.py:240)

        params = self.policy.update_ob_rms(params, ob, self.axis_name)
        params_old = jax.tree.map(lambda x: x, params)

        # flat policy-parameter machinery
        pol_tree = _policy_leaves(params)
        th_before, unravel = jax.flatten_util.ravel_pytree(pol_tree)

        def with_pol(theta):
            t = unravel(theta)
            return {**params, "pol": t["pol"], "logstd": t["logstd"]}

        def losses_at(theta, o, a, at):
            return self._losses(with_pol(theta), params_old, o, a, at)

        lossbefore = pmean(losses_at(th_before, ob, ac, atarg))
        g = pmean(jax.grad(lambda th: losses_at(th, ob, ac, atarg)[0])(th_before))

        # DeepMimic-style fixed exploration noise: freeze logstd coordinates
        # (policy.fixed_logstd) by masking them out of the natural-gradient
        # direction
        if getattr(self.policy, "fixed_logstd", None) is not None:
            mask, _ = jax.flatten_util.ravel_pytree({
                "pol": jax.tree.map(jnp.ones_like, pol_tree["pol"]),
                "logstd": jnp.zeros_like(pol_tree["logstd"]),
            })
            g = g * mask
        else:
            mask = None

        # Fisher-vector product via double-vjp of mean KL on every 5th row
        fvp_ob = ob[::5]

        def meankl_at(theta):
            return jnp.mean(self.policy.kl(params_old, with_pol(theta), fvp_ob))

        def fisher_vector_product(p):
            hvp = jax.jvp(jax.grad(meankl_at), (th_before,), (p,))[1]
            return pmean(hvp) + cfg.cg_damping * p

        stepdir = cg(fisher_vector_product, g, cg_iters=cfg.cg_iters)
        if mask is not None:
            stepdir = stepdir * mask
        shs = 0.5 * jnp.dot(stepdir, fisher_vector_product(stepdir))
        lm = jnp.sqrt(shs / cfg.max_kl)
        fullstep = stepdir / jnp.maximum(lm, 1e-8)
        surrbefore = lossbefore[0]

        # KL line search with ≤10 halvings (trpo.py:264-284)
        def ls_cond(carry):
            i, stepsize, accepted = carry
            return (i < cfg.line_search_steps) & (~accepted)

        def ls_body(carry):
            i, stepsize, accepted = carry
            thnew = th_before + fullstep * stepsize
            ml = pmean(losses_at(thnew, ob, ac, atarg))
            surr, kl = ml[0], ml[1]
            improve = surr - surrbefore
            ok = (
                jnp.isfinite(ml).all()
                & (kl <= cfg.max_kl * 1.5)
                & (improve > 0)
            )
            stepsize_next = jnp.where(ok, stepsize, stepsize * 0.5)
            return (i + 1, stepsize_next, ok)

        zero_grad = jnp.allclose(g, 0.0)
        _, stepsize, accepted = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(0), jnp.asarray(1.0), jnp.asarray(False))
        )
        th_new = jnp.where(
            accepted & ~zero_grad, th_before + fullstep * stepsize, th_before
        )
        new_pol = unravel(th_new)
        params = {**params, "pol": new_pol["pol"], "logstd": new_pol["logstd"]}
        meanlosses = pmean(losses_at(th_new, ob, ac, atarg))

        # ---- value function: vf_iters epochs of minibatch Adam ----
        n = ob.shape[0]
        nmb = n // cfg.vf_batch_size

        vf_flat, vf_unravel = jax.flatten_util.ravel_pytree(params["vf"])

        def vf_loss(vf_theta, o, ret, ob_rms):
            p = {**params, "vf": vf_unravel(vf_theta), "ob_rms": ob_rms}
            vpred = self.policy.value(p, o)
            return jnp.mean(jnp.square(vpred - ret))

        def vf_epoch(carry, k_ep):
            vf_theta, adam_state, ob_rms = carry
            perm = jax.random.permutation(k_ep, n)
            mb_idx = perm[: nmb * cfg.vf_batch_size].reshape(nmb, cfg.vf_batch_size)

            def mb_step(c, idx):
                vf_theta, adam_state, ob_rms = c
                mbob = ob[idx]
                mbret = tdlamret[idx]
                ob_rms = running_stats.update(ob_rms, mbob, self.axis_name)
                gvf = pmean(jax.grad(vf_loss)(vf_theta, mbob, mbret, ob_rms))
                vf_theta, adam_state = adam.update(
                    adam_state, gvf, vf_theta, cfg.vf_stepsize)
                return (vf_theta, adam_state, ob_rms), None

            (vf_theta, adam_state, ob_rms), _ = jax.lax.scan(
                mb_step, (vf_theta, adam_state, ob_rms), mb_idx)
            return (vf_theta, adam_state, ob_rms), None

        key, k_vf = jax.random.split(key)
        ep_keys = jax.random.split(k_vf, cfg.vf_iters)
        (vf_flat, vf_adam, ob_rms), _ = jax.lax.scan(
            vf_epoch, (vf_flat, vf_adam, params["ob_rms"]), ep_keys)
        params = {**params, "vf": vf_unravel(vf_flat), "ob_rms": ob_rms}

        ev = explained_variance(vpredbefore, tdlamret)
        return params, vf_adam, meanlosses, ev, key

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def iteration(self, state: TRPOState) -> tuple[TRPOState, IterStats]:
        """One logged iteration = g_step segments each followed by a full
        TRPO update (trpo.py:230-295)."""
        cfg = self.cfg
        params, vf_adam = state.params, state.vf_adam
        env_state, new, key = state.env_state, state.new, state.key
        ep_ret, ep_len = state.cur_ep_ret, state.cur_ep_len

        ep_ret_sum = jnp.zeros((), jnp.float32)
        ep_len_sum = jnp.zeros((), jnp.float32)
        ep_count = jnp.zeros((), jnp.float32)
        meanlosses = jnp.zeros(5, jnp.float32)
        ev = jnp.zeros((), jnp.float32)

        ep_len_sum_last = jnp.zeros((), jnp.float32)
        ep_rets_all, ep_lens_all = [], []
        for _ in range(cfg.g_step):
            seg, env_state, new, key, ep_ret, ep_len = self._rollout(
                params, env_state, new, key, ep_ret, ep_len)
            params, vf_adam, meanlosses, ev, key = self._segment_update(
                params, vf_adam, seg, key)
            ep_ret_sum += seg["ep_ret_sum"]
            ep_len_sum += seg["ep_len_sum"]
            ep_count += seg["ep_count"].astype(jnp.float32)
            ep_len_sum_last = seg["ep_len_sum"]
            ep_rets_all.append(seg["ep_rets"])
            ep_lens_all.append(seg["ep_lens"])

        stats = IterStats(
            optimgain=meanlosses[0], meankl=meanlosses[1], entloss=meanlosses[2],
            surrgain=meanlosses[3], entropy=meanlosses[4], ev_tdlam_before=ev,
            ep_ret_sum=ep_ret_sum, ep_len_sum=ep_len_sum, ep_count=ep_count,
            timesteps=jnp.asarray(cfg.g_step * cfg.horizon * cfg.num_envs, jnp.float32),
            ep_len_sum_last=ep_len_sum_last,
            ep_rets=jnp.stack(ep_rets_all), ep_lens=jnp.stack(ep_lens_all),
        )
        new_state = TRPOState(
            params=params, vf_adam=vf_adam, env_state=env_state, new=new,
            key=key, cur_ep_ret=ep_ret, cur_ep_len=ep_len,
        )
        return new_state, stats
