"""Math utilities (reference: /root/reference/src/utils/math_util.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def explained_variance(ypred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """1 - Var[y - ypred]/Var[y] (math_util.py:25-38); returns NaN when
    Var[y] == 0 like the reference."""
    vary = jnp.var(y)
    return 1.0 - jnp.var(y - ypred) / vary


def discount(x: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """y[t] = Σ_k γ^k x[t+k] — scipy lfilter replaced by a reverse scan
    (math_util.py:5-23)."""

    def body(carry, xt):
        out = xt + gamma * carry
        return out, out

    _, y = jax.lax.scan(body, jnp.zeros_like(x[0]), x, reverse=True)
    return y


def discount_with_boundaries(x, new, gamma: float):
    """Like discount but resets at episode starts (math_util.py:59-73):
    y[t] = x[t] + γ·y[t+1]·(1 - new[t+1])."""
    new_shift = jnp.concatenate([new[1:], jnp.zeros_like(new[:1])])

    def body(carry, xs):
        xt, nonterm = xs
        out = xt + gamma * carry * nonterm
        return out, out

    _, y = jax.lax.scan(
        body, jnp.zeros_like(x[0]),
        (x, 1.0 - new_shift.astype(x.dtype)), reverse=True,
    )
    return y


def flatten(tree):
    """Pytree → flat vector + unravel fn."""
    import jax.flatten_util

    return jax.flatten_util.ravel_pytree(tree)
