from deepmimic_mujoco_tpu.mocap.constants import (  # noqa: F401
    BODY_JOINTS,
    BODY_JOINTS_IN_DP_ORDER,
    BODY_DEFS,
    DOF_DEF,
    PARAMS_KP_KD,
    JOINT_WEIGHT,
)
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_deepmimic_json  # noqa: F401
