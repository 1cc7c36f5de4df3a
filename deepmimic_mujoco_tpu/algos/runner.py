"""Evaluation / rollout export — the reference's ``runner``/
``traj_1_generator`` (/root/reference/src/trpo.py:356-436): run N episodes
with a deterministic (or stochastic) policy, report avg return/length,
optionally save trajectories as ``.npz``."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.models import distributions


def evaluate(env, policy, params, key, n_episodes: int = 100,
             horizon: int = 1024, stochastic: bool = False,
             save_path: Optional[str] = None, reset_mode: str = "rsi"):
    """Batched evaluation: runs ``n_episodes`` envs in parallel for up to
    ``horizon`` steps each, masking steps after termination (the reference
    runs them serially, trpo.py:379-385).

    ``reset_mode``: 'rsi' starts episodes from random mocap frames (the
    reference's runner semantics — note this DIFFERS from the training
    distribution, whose post-done resets are noise resets); 'noise' matches
    training.  Returns (avg_len, avg_ret); optionally saves
    obs/acs/rews/ep_rets/lens like the reference's ``.npz`` export
    (trpo.py:388-393)."""

    from deepmimic_mujoco_tpu.algos.trpo import pick_reset_fn

    keys = jax.random.split(key, n_episodes + 1)
    state = jax.vmap(pick_reset_fn(env, reset_mode))(keys[1:])

    @jax.jit
    def rollout(state, key):
        def step_fn(carry, _):
            state, alive, ep_ret, ep_len, key = carry
            key, k_act = jax.random.split(key)
            ob = state.obs
            mean, logstd = policy.mean_logstd(params, ob)
            if stochastic:
                ks = jax.random.split(k_act, n_episodes)
                ac = jax.vmap(distributions.diag_gaussian.sample)(ks, mean, logstd)
            else:
                ac = mean
            nxt = jax.vmap(env.step)(state, ac)
            # freeze finished envs
            ep_ret = ep_ret + jnp.where(alive, nxt.reward, 0.0)
            ep_len = ep_len + jnp.where(alive, 1, 0)
            alive2 = alive & ~nxt.done
            state2 = jax.tree.map(
                lambda new, old: jnp.where(
                    alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                nxt, state)
            return (state2, alive2, ep_ret, ep_len, key), (ob, ac, nxt.reward)

        alive = jnp.ones(n_episodes, bool)
        ep_ret = jnp.zeros(n_episodes, jnp.float32)
        ep_len = jnp.zeros(n_episodes, jnp.int32)
        carry, traj = jax.lax.scan(
            step_fn, (state, alive, ep_ret, ep_len, key), None, length=horizon)
        _, _, ep_ret, ep_len, _ = carry
        return ep_ret, ep_len, traj

    ep_ret, ep_len, traj = rollout(state, keys[0])
    avg_len = float(jnp.mean(ep_len))
    avg_ret = float(jnp.mean(ep_ret))
    if save_path is not None:
        # de-padded per-episode export: rows after an env's done are frozen
        # state, so each episode is truncated to its true length (ragged
        # object arrays — the reference's own export is a list of
        # variable-length trajs, trpo.py:385-393)
        obs, acs, rews = (np.asarray(t).swapaxes(0, 1) for t in traj)
        lens = np.asarray(ep_len)

        def ragged(arrs):
            out = np.empty(len(arrs), dtype=object)
            for i, a in enumerate(arrs):
                out[i] = a
            return out

        np.savez(
            save_path,
            obs=ragged([o[:l] for o, l in zip(obs, lens)]),
            acs=ragged([a[:l] for a, l in zip(acs, lens)]),
            rews=ragged([r[:l] for r, l in zip(rews, lens)]),
            ep_rets=np.asarray(ep_ret),
            lens=lens,
        )
    return avg_len, avg_ret
