"""Vanilla policy-gradient agent — the original stack's ``PGAgent``
(reference: /root/reference/src/dp_policy_testing/learning/pg_agent.py), the
base the PPO agent extends.

Shares everything with :class:`PPOAgent` (nets, normalizers, TD(λ) critic,
momentum solvers, exploration FSM) except the actor objective
(pg_agent.py:107-131):

    L_actor = 0.5·mean(adv · Σ(norm_a − norm_mean)²)
              + bound_loss/noise + weight decay

— advantage-weighted regression toward the taken (exploratory) actions with
a fixed-noise Gaussian, instead of PPO's clipped importance ratio."""

from __future__ import annotations

import jax.numpy as jnp

from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent


class PGAgent(PPOAgent):
    def _actor_loss(self, params, s, a, old_logp, adv):
        """pg_agent.py:118-131; ``old_logp`` is unused (no ratio), clip_frac
        reported as 0."""
        _, noise_std = self.exp_params_at(params["sample_count"])
        mean = self.actor_mean(params, s)
        norm_mean = self.a_norm.normalize(params["a_norm"], mean)
        norm_a = self.a_norm.normalize(params["a_norm"], a)
        sq = jnp.sum(jnp.square(norm_a - norm_mean), axis=-1)
        actor_loss = 0.5 * jnp.mean(adv * sq)
        actor_loss += self._bound_loss(params, norm_mean) / noise_std
        if self.actor_wd:
            actor_loss += self.actor_wd * 0.5 * sum(
                jnp.sum(jnp.square(l["w"])) for l in params["actor"])
        return actor_loss, jnp.zeros((), jnp.float32)
