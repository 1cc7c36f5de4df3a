"""Net builders for the original-stack agents
(reference: /root/reference/src/dp_policy_testing/learning/nets/
fc_2layers_1024units.py + net_builder.py): name → builder dispatch;
the canonical net is a 1024-512 relu MLP."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.mlp import apply_mlp, init_mlp


def fc_2layers_1024units(key, input_dim: int, out_dim: int):
    """1024-512 relu trunk + linear head (fc_2layers_1024units.py:5-12)."""
    return init_mlp(key, [input_dim, 1024, 512, out_dim])


def apply_relu_mlp(params, x):
    return apply_mlp(params, x, activation=jax.nn.relu)


_BUILDERS = {
    "fc_2layers_1024units": fc_2layers_1024units,
}


def build_net(net_name: str, key, input_dim: int, out_dim: int):
    """Dispatch (net_builder.py:4-10)."""
    if net_name not in _BUILDERS:
        raise ValueError(f"Unsupported net: {net_name}")
    return _BUILDERS[net_name](key, input_dim, out_dim)
