"""Behavior cloning pretraining for GAIL.

The reference calls ``behavior_clone.learn`` (gail.py:491-495) but the module
is missing from the repo (broken import upstream); this implements the
documented behaviour: supervised maximum-likelihood regression of the policy
on expert (obs, acs) minibatches with Adam, updating the obs running stats."""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.algos import adam
from deepmimic_mujoco_tpu.models import distributions
from deepmimic_mujoco_tpu.utils import running_stats


def behavior_clone(policy, params, dataset, max_iters: int = 10_000,
                   batch_size: int = 128, stepsize: float = 3e-4,
                   seed: int = 0, verbose_every: int = 1000):
    """Returns updated policy params after BC on ``dataset``
    (MujocoDset-like: .get_next_batch(batch, 'train'))."""
    pol_tree = {"pol": params["pol"], "logstd": params["logstd"]}
    theta, unravel = jax.flatten_util.ravel_pytree(pol_tree)
    opt = adam.init(theta.shape[0])
    ob_rms = params["ob_rms"]

    @jax.jit
    def bc_step(theta, opt, ob_rms, obs, acs):
        ob_rms = running_stats.update(ob_rms, obs)

        def loss_fn(th):
            t = unravel(th)
            p = {**params, "pol": t["pol"], "logstd": t["logstd"],
                 "ob_rms": ob_rms}
            mean, logstd = policy.mean_logstd(p, obs)
            return jnp.mean(
                distributions.diag_gaussian.neglogp(mean, logstd, acs))

        loss, grad = jax.value_and_grad(loss_fn)(theta)
        theta, opt = adam.update(opt, grad, theta, stepsize)
        return theta, opt, ob_rms, loss

    for it in range(max_iters):
        obs, acs = dataset.get_next_batch(batch_size, "train")
        theta, opt, ob_rms, loss = bc_step(
            theta, opt, ob_rms,
            jnp.asarray(obs, jnp.float32), jnp.asarray(acs, jnp.float32))
        if verbose_every and it % verbose_every == 0:
            print(f"BC iter {it}: loss {float(loss):.4f}")

    t = unravel(theta)
    return {**params, "pol": t["pol"], "logstd": t["logstd"], "ob_rms": ob_rms}
