"""Group-indexed normalizer
(reference: /root/reference/src/dp_policy_testing/learning/normalizer.py).

Each state dimension belongs to a group; NONE-group dims bypass
normalization.  Updates aggregate (count, sum, sum-sq) — across the device
mesh with psum instead of MPI reduce (normalizer.py:49-73); ``check_synced``
becomes a mesh invariant (normalizer.py:115-125)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Groups:
    NONE = -1
    MAIN = 0


class NormalizerState(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray
    count: jnp.ndarray
    mean_sq: jnp.ndarray


def init(size: int, groups_ids: Optional[np.ndarray] = None,
         init_mean: Optional[np.ndarray] = None,
         init_std: Optional[np.ndarray] = None) -> NormalizerState:
    mean = jnp.zeros(size, jnp.float32) if init_mean is None else jnp.asarray(init_mean, jnp.float32)
    std = jnp.ones(size, jnp.float32) if init_std is None else jnp.asarray(init_std, jnp.float32)
    return NormalizerState(
        mean=mean, std=std, count=jnp.zeros((), jnp.float32),
        mean_sq=jnp.square(mean) + jnp.square(std),
    )


def make(size: int, groups_ids=None, eps: float = 0.02, clip: float = jnp.inf):
    """Returns a small namespace of pure fns bound to group structure."""
    if groups_ids is None:
        groups_ids = np.zeros(size, np.int32)
    groups_ids = np.asarray(groups_ids, np.int32)
    active = jnp.asarray(groups_ids != Groups.NONE)

    def update(state: NormalizerState, batch: jnp.ndarray,
               axis_name: Optional[str] = None,
               weights: Optional[jnp.ndarray] = None) -> NormalizerState:
        """``weights`` (0/1 per row) lets callers exclude padding rows from
        the statistics without dynamic shapes."""
        batch = batch.reshape(-1, state.mean.shape[0])
        if weights is None:
            n = jnp.asarray(batch.shape[0], jnp.float32)
            s = jnp.sum(batch, axis=0)
            sq = jnp.sum(jnp.square(batch), axis=0)
        else:
            w = weights.reshape(-1, 1).astype(batch.dtype)
            n = jnp.sum(w)
            s = jnp.sum(batch * w, axis=0)
            sq = jnp.sum(jnp.square(batch) * w, axis=0)
        if axis_name is not None:
            n = jax.lax.psum(n, axis_name)
            s = jax.lax.psum(s, axis_name)
            sq = jax.lax.psum(sq, axis_name)
        tot = state.count + n
        new_mean = (state.mean * state.count + s) / tot
        new_mean_sq = (state.mean_sq * state.count + sq) / tot
        var = jnp.maximum(new_mean_sq - jnp.square(new_mean), 0.0)
        new_std = jnp.sqrt(var + eps * eps)
        return NormalizerState(
            mean=jnp.where(active, new_mean, state.mean),
            std=jnp.where(active, new_std, state.std),
            count=tot,
            mean_sq=jnp.where(active, new_mean_sq, state.mean_sq),
        )

    def normalize(state: NormalizerState, x: jnp.ndarray) -> jnp.ndarray:
        out = (x - state.mean) / state.std
        out = jnp.clip(out, -clip, clip)
        return jnp.where(active, out, x)

    def unnormalize(state: NormalizerState, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(active, x * state.std + state.mean, x)

    def check_synced(state: NormalizerState,
                     axis_name: Optional[str] = None) -> jnp.ndarray:
        """All replicas hold identical statistics (normalizer.py:115-125)."""
        if axis_name is None:
            return jnp.asarray(True)
        g = jax.lax.all_gather(jnp.stack([jnp.sum(state.mean), jnp.sum(state.std)]),
                               axis_name)
        return jnp.all(jnp.abs(g - g[0]) < 1e-5)

    class _NS:
        pass

    ns = _NS()
    ns.update = update
    ns.normalize = normalize
    ns.unnormalize = unnormalize
    ns.check_synced = check_synced
    ns.groups_ids = groups_ids
    return ns
