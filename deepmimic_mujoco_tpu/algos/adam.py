"""Flat-parameter Adam matching ``MpiAdam``
(/root/reference/src/mpi_adam.py:21-50) exactly: bias-corrected stepsize
a = lr·√(1−β₂ᵗ)/(1−β₁ᵗ), update θ ← θ + a·m/(√v+ε).

Gradient averaging across workers (Allreduce/nworkers) becomes a ``pmean``
before calling :func:`update`; ``sync``/``check_synced`` become device-mesh
invariants (see deepmimic_mujoco_tpu.parallel.collectives)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


def init(n: int) -> AdamState:
    return AdamState(
        m=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        t=jnp.zeros((), jnp.float32),
    )


def update(state: AdamState, flat_grad: jnp.ndarray, theta: jnp.ndarray,
           stepsize: float, beta1: float = 0.9, beta2: float = 0.999,
           epsilon: float = 1e-8):
    """Returns (new_theta, new_state).  NOTE the reference's sign convention:
    it *adds* ``-stepsize · m̂/(√v̂+ε)`` (mpi_adam.py:30-35)."""
    t = state.t + 1.0
    a = stepsize * jnp.sqrt(1.0 - beta2**t) / (1.0 - beta1**t)
    m = beta1 * state.m + (1.0 - beta1) * flat_grad
    v = beta2 * state.v + (1.0 - beta2) * jnp.square(flat_grad)
    step = -a * m / (jnp.sqrt(v) + epsilon)
    return theta + step, AdamState(m=m, v=v, t=t)
