"""Original-DeepMimic learning-stack parity layer
(reference: /root/reference/src/dp_policy_testing/ — the trimmed copy of the
original DeepMimic Python stack used to query pretrained policies and, when
embedded in the original driver, to train PPO agents).

Components: RLWorld / agent builder (JSON agent specs), PPO agent
(fc_2layers_1024units actor-critic, clipped surrogate + bound loss,
momentum optimizers with pmean gradient aggregation, adaptive stepsize on
clip fraction), group normalizers, path-structured replay buffer,
exploration-parameter annealing."""

from deepmimic_mujoco_tpu.dp_policy.rl_world import RLWorld  # noqa: F401
from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent  # noqa: F401
