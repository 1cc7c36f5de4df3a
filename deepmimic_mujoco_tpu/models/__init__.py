from deepmimic_mujoco_tpu.models import distributions  # noqa: F401
from deepmimic_mujoco_tpu.models.policy import MlpPolicy  # noqa: F401
