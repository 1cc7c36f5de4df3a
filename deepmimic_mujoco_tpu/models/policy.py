"""Gaussian MLP policy + value function.

Functional equivalent of the reference's ``MlpPolicy``
(/root/reference/src/mlp_policy_trpo.py): obs running-mean-std normalization
clipped to ±5, two separate tanh MLPs (value head ``vf``, policy mean head
``pol``, hidden 100×2 by default), and a state-independent learned ``logstd``
(gaussian_fixed_var=True path, mlp_policy_trpo.py:45-50).

Parameters are a dict pytree:
  {"pol": [...], "vf": [...], "logstd": (ac_dim,), "ob_rms": RunningMeanStd}

TRPO treats "pol"+"logstd" as the policy parameters; "ob_rms" is updated by
the sampler, never by gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import distributions
from deepmimic_mujoco_tpu.models.mlp import apply_mlp, init_mlp
from deepmimic_mujoco_tpu.utils import running_stats


class MlpPolicy(NamedTuple):
    """Static config; parameters live in the pytree returned by init().

    ``fixed_logstd``: when set, exploration noise is a constant (DeepMimic's
    fixed ExpParams noise rather than the reference TRPO's learned logstd,
    mlp_policy_trpo.py:45-50).  Prevents the std collapse that strangles
    exploration on hard imitation tasks; the value is still stored in the
    param pytree so act/kl/entropy are unchanged, but gradients to it are
    zeroed (see TRPO._segment_update)."""

    ob_dim: int
    ac_dim: int
    hid_size: int = 100
    num_hid_layers: int = 2
    fixed_logstd: float | None = None
    # hidden_sizes overrides hid_size×num_hid_layers when set, e.g.
    # (1024, 512) = the original DeepMimic fc_2layers_1024units net
    # (/root/reference/src/dp_policy_testing/learning/nets/
    # fc_2layers_1024units.py); activation 'tanh' (reference MlpPolicy) or
    # 'relu' (original DeepMimic nets)
    hidden_sizes: tuple | None = None
    activation: str = "tanh"

    @property
    def _act_fn(self):
        return {"tanh": jnp.tanh, "relu": jax.nn.relu}[self.activation]

    def init(self, key):
        k_pol, k_vf = jax.random.split(key)
        hidden = (list(self.hidden_sizes) if self.hidden_sizes
                  else [self.hid_size] * self.num_hid_layers)
        logstd0 = 0.0 if self.fixed_logstd is None else float(self.fixed_logstd)
        return {
            "pol": init_mlp(k_pol, [self.ob_dim] + hidden + [self.ac_dim],
                            final_scale=0.01),
            "vf": init_mlp(k_vf, [self.ob_dim] + hidden + [1]),
            "logstd": jnp.full(self.ac_dim, logstd0, jnp.float32),
            "ob_rms": running_stats.init(self.ob_dim),
        }

    # ------------------------------------------------------------------
    def _norm_obs(self, params, ob):
        return running_stats.normalize(params["ob_rms"], ob)

    def mean_logstd(self, params, ob):
        obz = self._norm_obs(params, ob)
        mean = apply_mlp(params["pol"], obz, activation=self._act_fn)
        logstd = jnp.broadcast_to(params["logstd"], mean.shape)
        return mean, logstd

    def value(self, params, ob):
        obz = self._norm_obs(params, ob)
        return apply_mlp(params["vf"], obz, activation=self._act_fn)[..., 0]

    def act(self, params, key, ob, stochastic=True):
        """(action, vpred) — reference ``MlpPolicy.act``
        (mlp_policy_trpo.py:54-65)."""
        mean, logstd = self.mean_logstd(params, ob)
        ac = jax.lax.cond(
            stochastic,
            lambda: distributions.diag_gaussian.sample(key, mean, logstd),
            lambda: mean,
        )
        return ac, self.value(params, ob)

    def neglogp(self, params, ob, ac):
        mean, logstd = self.mean_logstd(params, ob)
        return distributions.diag_gaussian.neglogp(mean, logstd, ac)

    def entropy(self, params, ob):
        _, logstd = self.mean_logstd(params, ob)
        return distributions.diag_gaussian.entropy(logstd)

    def kl(self, params_old, params_new, ob):
        """KL(old ‖ new) per-sample — reference ``oldpi.pd.kl(pi.pd)``
        (trpo.py:121)."""
        m0, s0 = self.mean_logstd(params_old, ob)
        m1, s1 = self.mean_logstd(params_new, ob)
        return distributions.diag_gaussian.kl(m0, s0, m1, s1)

    def update_ob_rms(self, params, obs, axis_name=None):
        new = dict(params)
        new["ob_rms"] = running_stats.update(params["ob_rms"], obs, axis_name)
        return new
