"""Running mean/std statistics as an explicit pytree.

Replaces the reference's numpy/TF ``RunningMeanStd``
(/root/reference/src/utils/misc_util.py:32-70,
/root/reference/src/utils/running_mean_std.py:5-33) — parallel-algorithm
updates; cross-worker aggregation becomes a ``psum`` over the device mesh
instead of an MPI Allreduce (mpi_moments)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @property
    def std(self):
        return jnp.sqrt(jnp.maximum(self.var, 1e-2**2))


def init(shape, epsilon: float = 1e-2, dtype=jnp.float32) -> RunningMeanStd:
    """Matches the reference's init (mean 0, std ε, count ε)."""
    return RunningMeanStd(
        mean=jnp.zeros(shape, dtype),
        var=jnp.full(shape, epsilon**2, dtype),
        count=jnp.asarray(epsilon, dtype),
    )


def update(rms: RunningMeanStd, batch: jnp.ndarray,
           axis_name: Optional[str] = None) -> RunningMeanStd:
    """Chan et al. parallel update from a batch (leading axis = samples).

    With ``axis_name`` the batch statistics are psum-aggregated across the
    device mesh first — the TPU-native equivalent of the reference's
    MPI-aggregated normalizer updates
    (/root/reference/src/dp_policy_testing/learning/normalizer.py:49-73)."""
    batch = batch.reshape((-1,) + rms.mean.shape)
    n = jnp.asarray(batch.shape[0], rms.count.dtype)
    s = jnp.sum(batch, axis=0)
    sq = jnp.sum(jnp.square(batch), axis=0)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
    batch_mean = s / n
    batch_var = sq / n - jnp.square(batch_mean)

    delta = batch_mean - rms.mean
    tot = rms.count + n
    new_mean = rms.mean + delta * n / tot
    m_a = rms.var * rms.count
    m_b = batch_var * n
    m2 = m_a + m_b + jnp.square(delta) * rms.count * n / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def normalize(rms: RunningMeanStd, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
    """(x - mean)/std clipped to ±clip — the reference's obs filter
    (/root/reference/src/mlp_policy_trpo.py:32-35)."""
    return jnp.clip((x - rms.mean) / rms.std, -clip, clip)
