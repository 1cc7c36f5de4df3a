"""deepmimic_mujoco_tpu — a TPU-native (JAX/XLA/Pallas/pjit) motion-imitation
RL framework with the capabilities of mingfeisun/DeepMimic_mujoco.

Subpackages
-----------
utils      batched math (quaternions, GAE), running stats, logging, monitors
mocap      DeepMimic motion-clip pipeline → device arrays
physics    pure-JAX rigid-body engine (FK, CRBA/RNEA, contacts, RK4)
envs       functional DeepMimic imitation environments (v1/v2/v3) + gym shim
models     policy/value networks, action distributions
algos      TRPO, GAIL, PPO, CG, datasets
parallel   device-mesh sharding, collectives, replica-sync tripwires
ops        Pallas TPU kernels for hot paths
io_utils   checkpointing, trajectory/video export
"""

__version__ = "0.1.0"
