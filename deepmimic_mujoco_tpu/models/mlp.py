"""Plain functional MLP with baselines-style initialization.

Parameters are explicit pytrees (lists of {"w", "b"}), so TRPO's
flat-parameter machinery (get-flat / set-from-flat / Fisher-vector products)
is just ``ravel_pytree``.  Matches the reference's ``dense`` layers with
``normc_initializer`` (/root/reference/src/utils/misc_util.py:14-30)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normc_init(key, shape, scale=1.0, dtype=jnp.float32):
    """Columns-normalized gaussian init (baselines normc_initializer)."""
    w = jax.random.normal(key, shape, dtype)
    w = w * scale / jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    return w


def init_mlp(key, sizes, final_scale=1.0, hidden_scale=1.0):
    """sizes = [in, h1, ..., out]; returns list of layer params."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        scale = final_scale if i == len(sizes) - 2 else hidden_scale
        params.append({
            "w": normc_init(k, (sizes[i], sizes[i + 1]), scale),
            "b": jnp.zeros(sizes[i + 1], jnp.float32),
        })
    return params


def apply_mlp(params, x, activation=jnp.tanh, final_activation=None):
    """Hidden layers use ``activation``; output layer is linear by default."""
    for layer in params[:-1]:
        x = activation(x @ layer["w"] + layer["b"])
    x = x @ params[-1]["w"] + params[-1]["b"]
    if final_activation is not None:
        x = final_activation(x)
    return x
