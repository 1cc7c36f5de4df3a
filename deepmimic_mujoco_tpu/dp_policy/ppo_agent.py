"""PPO agent — the original DeepMimic learning stack's PPOAgent
(reference: /root/reference/src/dp_policy_testing/learning/ppo_agent.py)
re-designed functional/jitted.

Faithful pieces:
* fc_2layers_1024units actor & critic on normalized states
  (ppo_agent.py:52-80; nets/fc_2layers_1024units.py)
* fixed exploration noise: a = mean + noise·a_norm.std·N(0,1), logp of the
  *normalized* noise (ppo_agent.py:85-90)
* losses (ppo_agent.py:93-121): critic = ½·mean((norm(tar) − norm(V))²);
  actor = −mean(min(ratio·adv, clip(ratio)·adv)) + bound loss
  (0.5·mean(Σ min(μ̂−bmin,0)² + max(μ̂−bmax,0)²), tf_util.py:65-71)
  + weight decay
* TD(λ) targets per path with value clamping to [val_min, val_max] from the
  reward bounds (ppo_agent.py:285-305; rl_agent.py:421-439)
* advantages standardized then clipped to ±norm_adv_clip (ppo_agent.py:195-199)
* momentum-SGD solvers with pmean gradient aggregation (mpi_solver.py:40-54)
* adaptive actor stepsize on clip fraction (ppo_agent.py:337-363)
* agent hyperparameters from the JSON spec format
  (/root/reference/src/data/agents/ct_agent_humanoid_ppo.txt)
"""

from __future__ import annotations

import json
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.dp_policy import normalizer
from deepmimic_mujoco_tpu.dp_policy.exp_params import ExpParams
from deepmimic_mujoco_tpu.dp_policy.nets import apply_relu_mlp, build_net
from deepmimic_mujoco_tpu.models.mlp import normc_init
from deepmimic_mujoco_tpu.parallel.collectives import maybe_pmean

_LOG2PI = float(np.log(2.0 * np.pi))


class MomentumState(NamedTuple):
    """TF MomentumOptimizer accumulator (mpi_solver wraps this)."""

    m: Any


def momentum_update(state, grads, params, lr, momentum=0.9):
    m = jax.tree.map(lambda a, g: momentum * a + g, state.m, grads)
    params = jax.tree.map(lambda p, a: p - lr * a, params, m)
    return params, MomentumState(m=m)


DEFAULT_SPEC = {
    "AgentType": "PPO",
    "ActorNet": "fc_2layers_1024units",
    "ActorStepsize": 2.5e-6,
    "ActorMomentum": 0.9,
    "ActorWeightDecay": 0.0005,
    "ActorInitOutputScale": 0.01,
    "CriticNet": "fc_2layers_1024units",
    "CriticStepsize": 0.01,
    "CriticMomentum": 0.9,
    "CriticWeightDecay": 0,
    "Discount": 0.95,
    "BatchSize": 4096,
    "MiniBatchSize": 256,
    "Epochs": 1,
    "ReplayBufferSize": 500000,
    "RatioClip": 0.2,
    "NormAdvClip": 4,
    "TDLambda": 0.95,
    "TarClipFrac": -1,
    "ActorStepsizeDecay": 0.5,
    "ExpAnnealSamples": 64000000,
    "ExpParamsBeg": {"Rate": 1, "Noise": 0.05},
    "ExpParamsEnd": {"Rate": 0.2, "Noise": 0.05},
}


class PPOAgent:
    # flag bit marking exploring actions — only these train the actor
    # (pg_agent.py:194-208 sets _exp_action; ppo_agent.py:183 filters)
    EXP_ACTION_FLAG = 1

    def __init__(self, state_size: int, action_size: int,
                 spec: Optional[dict] = None,
                 action_bounds: Optional[tuple] = None,
                 reward_bounds: tuple = (0.0, 1.0),
                 axis_name: Optional[str] = None,
                 state_norm_groups: Optional[np.ndarray] = None,
                 state_offset: Optional[np.ndarray] = None,
                 state_scale: Optional[np.ndarray] = None):
        self.spec = {**DEFAULT_SPEC, **(spec or {})}
        s = self.spec
        self.state_size = state_size
        self.action_size = action_size
        self.axis_name = axis_name
        self.discount = float(s["Discount"])
        self.td_lambda = float(s["TDLambda"])
        self.ratio_clip = float(s["RatioClip"])
        self.norm_adv_clip = float(s["NormAdvClip"])
        self.mini_batch_size = int(s["MiniBatchSize"])
        self.batch_size = int(s["BatchSize"])
        self.epochs = int(s["Epochs"])
        self.actor_wd = float(s["ActorWeightDecay"])
        self.critic_wd = float(s["CriticWeightDecay"])
        self.tar_clip_frac = float(s["TarClipFrac"])
        self.stepsize_decay = float(s["ActorStepsizeDecay"])
        self.exp_beg = ExpParams.from_json(s["ExpParamsBeg"])
        self.exp_end = ExpParams.from_json(s["ExpParamsEnd"])
        self.exp_anneal_samples = float(s["ExpAnnealSamples"])

        # value bounds from reward bounds (rl_agent.py:421-439)
        r_min, r_max = reward_bounds
        self.val_min = r_min / (1.0 - self.discount)
        self.val_max = r_max / (1.0 - self.discount)

        if action_bounds is None:
            action_bounds = (-0.5 * np.ones(action_size), 0.5 * np.ones(action_size))
        self.a_bound_min = jnp.asarray(action_bounds[0], jnp.float32)
        self.a_bound_max = jnp.asarray(action_bounds[1], jnp.float32)

        # normalizer bootstrap from the env builders (rl_agent.py:222-234:
        # s_norm.set_mean_std(-offset, 1/scale) with env norm groups)
        self.s_norm = normalizer.make(state_size, groups_ids=state_norm_groups)
        self._s_init_mean = (None if state_offset is None
                             else -np.asarray(state_offset, np.float32))
        self._s_init_std = (None if state_scale is None
                            else 1.0 / np.asarray(state_scale, np.float32))
        self.a_norm = normalizer.make(action_size)
        self.val_norm = normalizer.make(1)

    @classmethod
    def for_env(cls, env, spec: Optional[dict] = None, **kwargs) -> "PPOAgent":
        """Build an agent bootstrapped from the env's DeepMimic-API builders
        (the original agent construction path, rl_agent.py:207-234)."""
        bounds = None
        if hasattr(env, "build_action_bound_min"):
            bounds = (np.asarray(env.build_action_bound_min()),
                      np.asarray(env.build_action_bound_max()))
        return cls(
            state_size=env.observation_size, action_size=env.action_size,
            spec=spec, action_bounds=bounds,
            state_norm_groups=(np.asarray(env.build_state_norm_groups(),
                                          np.int32)
                               if hasattr(env, "build_state_norm_groups")
                               else None),
            state_offset=(env.build_state_offset()
                          if hasattr(env, "build_state_offset") else None),
            state_scale=(env.build_state_scale()
                         if hasattr(env, "build_state_scale") else None),
            **kwargs)

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        k_a, k_c, k_out = jax.random.split(key, 3)
        actor = build_net(self.spec["ActorNet"], k_a, self.state_size,
                          self.action_size)
        # ActorInitOutputScale on the output layer (ppo_agent.py:62-66)
        actor[-1]["w"] = normc_init(
            k_out, actor[-1]["w"].shape,
            scale=float(self.spec["ActorInitOutputScale"]))
        critic = build_net(self.spec["CriticNet"], k_c, self.state_size, 1)
        a_mid = 0.5 * (self.a_bound_min + self.a_bound_max)
        a_span = 0.5 * (self.a_bound_max - self.a_bound_min)
        return {
            "actor": actor,
            "critic": critic,
            "s_norm": normalizer.init(self.state_size,
                                      init_mean=self._s_init_mean,
                                      init_std=self._s_init_std),
            "a_norm": normalizer.init(
                self.action_size, init_mean=a_mid, init_std=a_span),
            "val_norm": normalizer.init(1),
            "actor_opt": MomentumState(jax.tree.map(jnp.zeros_like, actor)),
            "critic_opt": MomentumState(jax.tree.map(jnp.zeros_like, critic)),
            "actor_stepsize": jnp.asarray(float(self.spec["ActorStepsize"])),
            "sample_count": jnp.zeros((), jnp.float32),
        }

    # ------------------------------------------------------------------
    def exp_params_at(self, sample_count) -> tuple:
        """(rate, noise) annealed by sample count (rl_agent.py:358-362)."""
        t = jnp.clip(sample_count / self.exp_anneal_samples, 0.0, 1.0)
        rate = (1 - t) * self.exp_beg.rate + t * self.exp_end.rate
        noise = (1 - t) * self.exp_beg.noise + t * self.exp_end.noise
        return rate, noise

    def actor_mean(self, params, s):
        s_n = self.s_norm.normalize(params["s_norm"], s)
        return apply_relu_mlp(params["actor"], s_n)

    def eval_critic(self, params, s):
        s_n = self.s_norm.normalize(params["s_norm"], s)
        v_n = apply_relu_mlp(params["critic"], s_n)[..., 0]
        return self.val_norm.unnormalize(params["val_norm"], v_n[..., None])[..., 0]

    def decide_action(self, params, key, s, exploring):
        """(action, logp) — mean + noise·a_std exploration with logp of the
        normalized noise (ppo_agent.py:85-90,147-164)."""
        _, noise_std = self.exp_params_at(params["sample_count"])
        mean = self.actor_mean(params, s)
        norm_noise = noise_std * jax.random.normal(key, mean.shape)
        norm_noise = norm_noise * jnp.asarray(exploring, mean.dtype)
        a = mean + norm_noise * params["a_norm"].std
        logp = -0.5 * jnp.sum(jnp.square(norm_noise / noise_std), axis=-1) \
            - 0.5 * self.action_size * _LOG2PI \
            - self.action_size * jnp.log(noise_std)
        return a, logp

    def get_action(self, params, s):
        """Deterministic action for inference (GetAction.py usage)."""
        return self.actor_mean(params, jnp.asarray(s, jnp.float32))

    # ------------------------------------------------------------------
    def compute_new_vals(self, rewards, vals, path_end):
        """TD(λ) targets per path (ppo_agent.py:291-305, rl_util.py
        compute_return): backward scan resetting at path ends; vals has one
        extra bootstrap entry per step (vals[t+1])."""
        lam, gamma = self.td_lambda, self.discount

        def body(carry, xs):
            r, v_next, is_end = xs
            nonterm = 1.0 - is_end
            ret = r + gamma * ((1 - lam) * v_next + lam * carry) * nonterm \
                + gamma * v_next * is_end * 0.0
            return ret, ret

        _, new_vals = jax.lax.scan(
            body, jnp.zeros_like(rewards[0]),
            (rewards, vals[1:], path_end.astype(rewards.dtype)), reverse=True)
        return new_vals

    def _critic_loss(self, params, s, tar_vals):
        """critic loss (ppo_agent.py:93-103, shared with the PG agent)."""
        v_n = apply_relu_mlp(
            params["critic"], self.s_norm.normalize(params["s_norm"], s))[..., 0]
        tar_n = self.val_norm.normalize(params["val_norm"], tar_vals[..., None])[..., 0]
        critic_loss = 0.5 * jnp.mean(jnp.square(tar_n - v_n))
        if self.critic_wd:
            critic_loss += self.critic_wd * 0.5 * sum(
                jnp.sum(jnp.square(l["w"])) for l in params["critic"])
        return critic_loss

    def _bound_loss(self, params, norm_mean):
        """bound loss on the normalized mean (tf_util.py:65-71)."""
        bmin = self.a_norm.normalize(params["a_norm"], self.a_bound_min)
        bmax = self.a_norm.normalize(params["a_norm"], self.a_bound_max)
        v_min = jnp.minimum(norm_mean - bmin, 0.0)
        v_max = jnp.maximum(norm_mean - bmax, 0.0)
        return 0.5 * jnp.mean(
            jnp.sum(jnp.square(v_min), -1) + jnp.sum(jnp.square(v_max), -1))

    def _actor_loss(self, params, s, a, old_logp, adv):
        """clipped-surrogate actor loss + bound loss (ppo_agent.py:105-121);
        returns (loss, clip_frac)."""
        _, noise_std = self.exp_params_at(params["sample_count"])
        mean = self.actor_mean(params, s)
        norm_mean = self.a_norm.normalize(params["a_norm"], mean)
        norm_a = self.a_norm.normalize(params["a_norm"], a)
        logp = -0.5 * jnp.sum(jnp.square((norm_a - norm_mean) / noise_std), axis=-1) \
            - 0.5 * self.action_size * _LOG2PI \
            - self.action_size * jnp.log(noise_std)
        ratio = jnp.exp(logp - old_logp)
        surr0 = adv * ratio
        surr1 = adv * jnp.clip(ratio, 1.0 - self.ratio_clip, 1.0 + self.ratio_clip)
        actor_loss = -jnp.mean(jnp.minimum(surr0, surr1))
        actor_loss += self._bound_loss(params, norm_mean)
        if self.actor_wd:
            actor_loss += self.actor_wd * 0.5 * sum(
                jnp.sum(jnp.square(l["w"])) for l in params["actor"])
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > self.ratio_clip).astype(jnp.float32))
        return actor_loss, clip_frac

    def losses(self, params, s, a, old_logp, adv, tar_vals):
        """actor/critic losses (ppo_agent.py:93-121)."""
        critic_loss = self._critic_loss(params, s, tar_vals)
        actor_loss, clip_frac = self._actor_loss(params, s, a, old_logp, adv)
        return critic_loss, actor_loss, clip_frac

    @partial(jax.jit, static_argnums=0)
    def update(self, params, key, states, actions, logps, rewards, path_end):
        """One training update from a batch of path-structured transitions
        (states has one extra bootstrap row; ppo_agent.py:170-260)."""
        vals = self.eval_critic(params, states)
        new_vals = self.compute_new_vals(rewards, vals, path_end)
        adv = new_vals - vals[:-1]
        new_vals = jnp.clip(new_vals, self.val_min, self.val_max)
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-5)
        adv = jnp.clip(adv, -self.norm_adv_clip, self.norm_adv_clip)

        n = rewards.shape[0]
        nmb = max(1, n // self.mini_batch_size)
        s_t = states[:-1]

        def epoch(carry, k_ep):
            params, closs, aloss, cfrac = carry
            perm = jax.random.permutation(k_ep, n)
            mb_idx = perm[: nmb * self.mini_batch_size].reshape(nmb, -1)

            # two separate solvers, matching the reference's split updates
            def mb_step(carry, idx):
                params, closs, aloss, cfrac = carry
                s, a = s_t[idx], actions[idx]
                lp, ad, tv = logps[idx], adv[idx], new_vals[idx]

                def critic_loss_fn(critic):
                    p = {**params, "critic": critic}
                    cl, _, _ = self.losses(p, s, a, lp, ad, tv)
                    return cl

                cl, cg = jax.value_and_grad(critic_loss_fn)(params["critic"])
                cg = maybe_pmean(cg, self.axis_name)
                critic, copt = momentum_update(
                    params["critic_opt"], cg, params["critic"],
                    float(self.spec["CriticStepsize"]),
                    float(self.spec["CriticMomentum"]))

                def actor_loss_fn(actor):
                    p = {**params, "actor": actor}
                    _, al, cf = self.losses(p, s, a, lp, ad, tv)
                    return al, cf

                (al, cf), ag = jax.value_and_grad(
                    actor_loss_fn, has_aux=True)(params["actor"])
                ag = maybe_pmean(ag, self.axis_name)
                actor, aopt = momentum_update(
                    params["actor_opt"], ag, params["actor"],
                    params["actor_stepsize"],
                    float(self.spec["ActorMomentum"]))
                params = {**params, "critic": critic, "critic_opt": copt,
                          "actor": actor, "actor_opt": aopt}
                return (params, closs + cl, aloss + jnp.abs(al), cfrac + cf), None

            (params, closs, aloss, cfrac), _ = jax.lax.scan(
                mb_step, (params, closs, aloss, cfrac), mb_idx)
            return (params, closs, aloss, cfrac), None

        keys = jax.random.split(key, self.epochs)
        zero = jnp.zeros((), jnp.float32)
        (params, closs, aloss, cfrac), _ = jax.lax.scan(
            epoch, (params, zero, zero, zero), keys)
        total = self.epochs * nmb
        closs, aloss, cfrac = closs / total, aloss / total, cfrac / total
        closs = maybe_pmean(closs, self.axis_name)
        aloss = maybe_pmean(aloss, self.axis_name)
        cfrac = maybe_pmean(cfrac, self.axis_name)

        # adaptive actor stepsize on clip fraction (ppo_agent.py:337-363)
        stepsize = params["actor_stepsize"]
        if self.tar_clip_frac >= 0:
            over = cfrac > self.tar_clip_frac * 1.5
            under = cfrac < self.tar_clip_frac / 1.5
            stepsize = jnp.where(over, stepsize * self.stepsize_decay, stepsize)
            stepsize = jnp.where(under, stepsize / self.stepsize_decay, stepsize)
            stepsize = jnp.clip(stepsize, 1e-8, 1e-2)
        # normalizer / sample-count bookkeeping
        s_norm = self.s_norm.update(params["s_norm"], states, self.axis_name)
        val_norm = self.val_norm.update(
            params["val_norm"], new_vals[..., None], self.axis_name)
        params = {**params, "actor_stepsize": stepsize, "s_norm": s_norm,
                  "val_norm": val_norm,
                  "sample_count": params["sample_count"] + n}
        metrics = {"critic_loss": closs, "actor_loss": aloss,
                   "clip_frac": cfrac, "actor_stepsize": stepsize}
        return params, metrics

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 11))
    def train_on_batch(self, params, key, states, actions, logps, rewards,
                       is_end, is_fail, is_succ, is_exp, n_mb: int,
                       valid=None):
        """The original ``_train_step`` (ppo_agent.py:165-262) over a whole
        replay-buffer batch in record layout: each path is n+1 consecutive
        records, the last being the bootstrap/terminal state (is_end).

        * critic values at FAIL ends are ``val_fail`` (= r_min/(1−γ)), SUCC
          ends ``val_succ`` (_compute_batch_vals, ppo_agent.py:275-289)
        * TD(λ) targets per path via a masked backward scan
          (_compute_batch_new_vals)
        * advantages only at exploration-flagged records; standardized,
          clipped to ±NormAdvClip (ppo_agent.py:183-196)
        * per epoch, ``n_mb`` minibatches: critic batches drawn from
          non-end records, actor batches from exp records
          (ppo_agent.py:202-243)
        * arrays may be padded: ``valid`` masks live records (padding must
          carry is_end=True so the scan resets there)
        """
        f32 = jnp.float32
        if valid is None:
            valid = jnp.ones(rewards.shape[0], bool)
        is_end = is_end | ~valid
        gamma, lam = self.discount, self.td_lambda

        vals = self.eval_critic(params, states)
        vals = jnp.where(is_fail, self.val_min, vals)
        vals = jnp.where(is_succ, self.val_max, vals)

        vnext = jnp.concatenate([vals[1:], vals[-1:]])

        def body(carry, xs):
            v, v_n, r, end = xs
            ret = jnp.where(end, v, r + gamma * ((1 - lam) * v_n + lam * carry))
            return ret, ret

        _, new_vals = jax.lax.scan(
            body, jnp.zeros((), f32), (vals, vnext, rewards, is_end),
            reverse=True)

        exp_w = (is_exp & ~is_end & valid).astype(f32)
        n_exp = jnp.maximum(jnp.sum(exp_w), 1.0)
        adv = new_vals - vals
        adv_mean = jnp.sum(adv * exp_w) / n_exp
        adv_std = jnp.sqrt(jnp.sum(exp_w * jnp.square(adv - adv_mean)) / n_exp)
        adv = jnp.clip((adv - adv_mean) / (adv_std + 1e-5),
                       -self.norm_adv_clip, self.norm_adv_clip)
        new_vals = jnp.clip(new_vals, self.val_min, self.val_max)

        valid_w = ((~is_end) & valid).astype(f32)
        p_critic = valid_w / jnp.maximum(jnp.sum(valid_w), 1.0)
        p_actor = exp_w / n_exp
        N = rewards.shape[0]

        def epoch(carry, k_ep):
            params, closs, aloss, cfrac = carry
            mb_keys = jax.random.split(k_ep, n_mb)

            def mb_step(carry, k_mb):
                params, closs, aloss, cfrac = carry
                k_c, k_a = jax.random.split(k_mb)
                c_idx = jax.random.choice(
                    k_c, N, (self.mini_batch_size,), p=p_critic)
                a_idx = jax.random.choice(
                    k_a, N, (self.mini_batch_size,), p=p_actor)

                def critic_loss_fn(critic):
                    p = {**params, "critic": critic}
                    cl, _, _ = self.losses(
                        p, states[c_idx], actions[c_idx], logps[c_idx],
                        adv[c_idx], new_vals[c_idx])
                    return cl

                cl, cg = jax.value_and_grad(critic_loss_fn)(params["critic"])
                cg = maybe_pmean(cg, self.axis_name)
                critic, copt = momentum_update(
                    params["critic_opt"], cg, params["critic"],
                    float(self.spec["CriticStepsize"]),
                    float(self.spec["CriticMomentum"]))

                def actor_loss_fn(actor):
                    p = {**params, "actor": actor}
                    _, al, cf = self.losses(
                        p, states[a_idx], actions[a_idx], logps[a_idx],
                        adv[a_idx], new_vals[a_idx])
                    return al, cf

                (al, cf), ag = jax.value_and_grad(
                    actor_loss_fn, has_aux=True)(params["actor"])
                ag = maybe_pmean(ag, self.axis_name)
                actor, aopt = momentum_update(
                    params["actor_opt"], ag, params["actor"],
                    params["actor_stepsize"],
                    float(self.spec["ActorMomentum"]))
                params = {**params, "critic": critic, "critic_opt": copt,
                          "actor": actor, "actor_opt": aopt}
                return (params, closs + cl, aloss + jnp.abs(al),
                        cfrac + cf), None

            (params, closs, aloss, cfrac), _ = jax.lax.scan(
                mb_step, (params, closs, aloss, cfrac), mb_keys)
            return (params, closs, aloss, cfrac), None

        keys = jax.random.split(key, self.epochs)
        zero = jnp.zeros((), f32)
        (params, closs, aloss, cfrac), _ = jax.lax.scan(
            epoch, (params, zero, zero, zero), keys)
        total = self.epochs * n_mb
        closs, aloss, cfrac = closs / total, aloss / total, cfrac / total
        closs = maybe_pmean(closs, self.axis_name)
        aloss = maybe_pmean(aloss, self.axis_name)
        cfrac = maybe_pmean(cfrac, self.axis_name)

        stepsize = params["actor_stepsize"]
        if self.tar_clip_frac >= 0:
            over = cfrac > self.tar_clip_frac * 1.5
            under = cfrac < self.tar_clip_frac / 1.5
            stepsize = jnp.where(over, stepsize * self.stepsize_decay, stepsize)
            stepsize = jnp.where(under, stepsize / self.stepsize_decay, stepsize)
            stepsize = jnp.clip(stepsize, 1e-8, 1e-2)

        row_w = valid.astype(f32)
        s_norm = self.s_norm.update(params["s_norm"], states, self.axis_name,
                                    weights=row_w)
        val_norm = self.val_norm.update(
            params["val_norm"], new_vals[..., None], self.axis_name,
            weights=valid_w)
        n_samples = jnp.sum(valid_w)
        params = {**params, "actor_stepsize": stepsize, "s_norm": s_norm,
                  "val_norm": val_norm,
                  "sample_count": params["sample_count"] + n_samples}
        metrics = {"critic_loss": closs, "actor_loss": aloss,
                   "clip_frac": cfrac, "actor_stepsize": stepsize,
                   "adv_mean": adv_mean, "adv_std": adv_std}
        return params, metrics

    # ------------------------------------------------------------------
    @staticmethod
    def load_spec(path: str) -> dict:
        with open(path) as f:
            return json.load(f)
