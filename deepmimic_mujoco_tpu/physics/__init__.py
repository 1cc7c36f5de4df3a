from deepmimic_mujoco_tpu.physics.model import PhysicsModel, ModelBuilder  # noqa: F401
from deepmimic_mujoco_tpu.physics.humanoid import build_humanoid  # noqa: F401
from deepmimic_mujoco_tpu.physics import engine  # noqa: F401
