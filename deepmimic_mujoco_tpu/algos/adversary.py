"""GAIL discriminator — the reference's ``TransitionClassifier``
(/root/reference/src/adversary.py): obs RMS-normalized, concatenated with the
action, through a 2×tanh FC(hidden) net to a logit.

Losses (adversary.py:38-49): sigmoid-CE pushing generator transitions → 0
and expert transitions → 1, plus a Bernoulli-entropy bonus (entcoeff·H).
Reward for the policy (adversary.py:51): −log(1 − σ(logit) + 1e-8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.mlp import apply_mlp, init_mlp
from deepmimic_mujoco_tpu.utils import running_stats


class TransitionClassifier(NamedTuple):
    ob_dim: int
    ac_dim: int
    hidden_size: int = 100
    entcoeff: float = 0.001

    def init(self, key):
        return {
            "net": init_mlp(
                key,
                [self.ob_dim + self.ac_dim, self.hidden_size, self.hidden_size, 1],
            ),
            "obs_rms": running_stats.init(self.ob_dim),
        }

    def logits(self, params, obs, acs):
        # reference normalizes without clipping: (ob - mean)/std (adversary.py:64)
        obz = (obs - params["obs_rms"].mean) / params["obs_rms"].std
        x = jnp.concatenate([obz, acs], axis=-1)
        return apply_mlp(params["net"], x)[..., 0]

    def loss(self, params, gen_obs, gen_acs, exp_obs, exp_acs):
        """Returns (total_loss, metrics) — adversary.py:38-49."""
        gen_logits = self.logits(params, gen_obs, gen_acs)
        exp_logits = self.logits(params, exp_obs, exp_acs)
        # sigmoid cross-entropy with integer targets 0 (gen) / 1 (expert)
        gen_loss = jnp.mean(
            jnp.maximum(gen_logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(gen_logits))))
        exp_loss = jnp.mean(
            jnp.maximum(exp_logits, 0) - exp_logits
            + jnp.log1p(jnp.exp(-jnp.abs(exp_logits))))
        logits = jnp.concatenate([gen_logits, exp_logits])
        p = jax.nn.sigmoid(logits)
        entropy = jnp.mean(
            -p * jax.nn.log_sigmoid(logits) - (1 - p) * jax.nn.log_sigmoid(-logits))
        entropy_loss = -self.entcoeff * entropy
        total = gen_loss + exp_loss + entropy_loss
        gen_acc = jnp.mean((gen_logits < 0).astype(jnp.float32))
        exp_acc = jnp.mean((exp_logits > 0).astype(jnp.float32))
        return total, {
            "generator_loss": gen_loss, "expert_loss": exp_loss,
            "entropy": entropy, "entropy_loss": entropy_loss,
            "generator_acc": gen_acc, "expert_acc": exp_acc,
        }

    def reward(self, params, obs, acs):
        """−log(1 − σ(D)) + ε — the GAIL learning signal (adversary.py:51)."""
        logits = self.logits(params, obs, acs)
        return -jnp.log(1.0 - jax.nn.sigmoid(logits) + 1e-8)

    def update_obs_rms(self, params, obs):
        return {**params, "obs_rms": running_stats.update(params["obs_rms"], obs)}
