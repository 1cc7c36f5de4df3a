"""Conjugate gradient on an implicit SPD operator.

Replaces /root/reference/src/cg.py:2-34 (numpy CG on the Fisher-vector
product) with a jit-safe ``lax.while_loop`` — same update order, residual
tolerance 1e-10, capped iterations."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cg(f_Ax: Callable, b: jnp.ndarray, cg_iters: int = 10,
       residual_tol: float = 1e-10) -> jnp.ndarray:
    def cond(carry):
        i, x, r, p, rdotr = carry
        return (i < cg_iters) & (rdotr > residual_tol)

    def body(carry):
        i, x, r, p, rdotr = carry
        z = f_Ax(p)
        v = rdotr / jnp.dot(p, z)
        x = x + v * p
        r = r - v * z
        newrdotr = jnp.dot(r, r)
        mu = newrdotr / rdotr
        p = r + mu * p
        return (i + 1, x, r, p, newrdotr)

    x0 = jnp.zeros_like(b)
    carry = (jnp.asarray(0), x0, b, b, jnp.dot(b, b))
    _, x, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return x
