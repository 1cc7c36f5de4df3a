"""Environment state pytree."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@dataclasses.dataclass(frozen=True)
class EnvState:
    """Complete, explicit per-env state (the reference keeps this implicit in
    MjSim + Python attributes; here it is a pytree so envs jit/vmap/scan).

    Fields
    ------
    qpos, qvel   physics state
    obs          observation after the last transition
    reward       reward of the last transition
    done         termination flag of the last transition
    mocap_idx    current mocap cursor (reference ``idx_curr``)
    init_idx     episode start frame (reference ``idx_init``)
    step_count   steps since episode start
    key          per-env PRNG key
    """

    qpos: Any
    qvel: Any
    obs: Any
    reward: Any
    done: Any
    mocap_idx: Any
    init_idx: Any
    step_count: Any
    key: Any
    # multi-skill envs: index of the active mocap clip (None elsewhere —
    # None is an empty pytree node, so single-clip envs are unaffected)
    clip_id: Any = None


jax.tree_util.register_dataclass(
    EnvState,
    data_fields=[
        "qpos", "qvel", "obs", "reward", "done",
        "mocap_idx", "init_idx", "step_count", "key", "clip_id",
    ],
    meta_fields=[],
)
