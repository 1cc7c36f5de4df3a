"""Generalized Advantage Estimation as a reverse scan.

Replaces the reference's reversed Python loop (``add_vtarg_and_adv``,
/root/reference/src/trpo.py:83-94) with ``lax.scan`` over the time axis —
identical semantics including cross-episode batches: ``new[t]`` marks the
start of a new episode at t, ``nextvpred`` is the bootstrap value after the
last step (0 if it ended an episode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_vtarg_and_adv(rew, vpred, new, nextvpred, gamma: float, lam: float):
    """rew/vpred/new: (T,) or (T, B); nextvpred: scalar or (B,).

    Returns (adv, tdlamret) with the reference's exact recursion:
      nonterminal[t] = 1 - new[t+1]   (new[T] := 0)
      delta[t] = rew[t] + γ·vpred[t+1]·nonterminal - vpred[t]
      adv[t]   = delta[t] + γλ·nonterminal·adv[t+1]
    """
    new_shift = jnp.concatenate([new[1:], jnp.zeros_like(new[:1])], axis=0)
    nextvpred = jnp.expand_dims(jnp.asarray(nextvpred, vpred.dtype), 0)
    vpred_next = jnp.concatenate([vpred[1:], nextvpred], axis=0)

    def body(carry, xs):
        r, v, v_next, nonterm = xs
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * carry
        return adv, adv

    nonterminal = 1.0 - new_shift.astype(rew.dtype)
    _, adv = jax.lax.scan(
        body,
        jnp.zeros_like(rew[0]),
        (rew, vpred, vpred_next, nonterminal),
        reverse=True,
    )
    return adv, adv + vpred
