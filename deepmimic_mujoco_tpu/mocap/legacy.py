"""Legacy v1 mocap surface — the reference's ``mocap_v1.MocapDM``
(/root/reference/src/mujoco/mocap_v1.py), kept for parity with the earliest
DPEnv generation (dp_env_v1 consumed this loader before v2 replaced it).

Differences from v2 the class reproduces faithfully:
* ``data`` keeps the joint rotations as **quaternions** (v2 converts to
  euler-rxyz hinge triples): rows are [duration, root_pos3, root_quat4,
  per-joint quat4/scalar] in MuJoCo joint order (mocap_v1.py:92-151) — the
  same layout our ``MocapClip.quat_frames`` already carries.
* ``data_angle`` mixes representations per frame: root pos (3) + root quat
  (4, NOT euler) + joints as hand-rolled roll-pitch-yaw euler triples /
  scalars (mocap_v1.py:118-151) — reproduced quirk-for-quirk.
* ``quat2euler`` is the v1 hand-rolled aircraft-rpy conversion
  (mocap_v1.py:12-27, minus its debug prints).
"""

from __future__ import annotations

import math

import numpy as np

from deepmimic_mujoco_tpu.mocap.constants import BODY_JOINTS, DOF_DEF
from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_clip


def quat2euler(elements) -> list:
    """Hand-rolled wxyz-quaternion → [roll, pitch, yaw]
    (mocap_v1.py:12-27)."""
    q0, q1, q2, q3 = (float(e) for e in elements[:4])
    phi = math.atan2(2.0 * (q0 * q1 + q2 * q3),
                     1.0 - 2.0 * (q1 * q1 + q2 * q2))
    theta = math.asin(max(-1.0, min(1.0, 2.0 * (q0 * q2 - q3 * q1))))
    psi = math.atan2(2.0 * (q0 * q3 + q1 * q2),
                     1.0 - 2.0 * (q2 * q2 + q3 * q3))
    return [phi, theta, psi]


class MocapV1:
    """v1 ``MocapDM`` API over the shared clip pipeline."""

    def __init__(self):
        from deepmimic_mujoco_tpu.mocap.constants import BODY_DEFS

        self.num_bodies = len(BODY_DEFS)
        self.pos_dim = 3
        self.rot_dim = 4

    def load_mocap(self, filepath_or_name: str) -> None:
        if filepath_or_name.endswith((".txt", ".json", ".npz")):
            clip = load_clip(filepath_or_name)
        else:
            from deepmimic_mujoco_tpu.mocap.registry import get_clip

            clip = get_clip(filepath_or_name)
        self._from_clip(clip)

    def _from_clip(self, clip: MocapClip) -> None:
        self.clip = clip
        qf = np.asarray(clip.quat_frames)   # [dura, pos3, quat4, joints…]
        self.dt = clip.dt
        self.durations = qf[:, 0].tolist()
        self.data = qf.copy()

        # all_states: per-frame dicts of aligned values (mocap_v1.py:60-75)
        self.all_states = []
        for k in range(len(qf)):
            st = {"root_pos": qf[k, 1:4], "root_rot": qf[k, 4:8]}
            off = 8
            for j in BODY_JOINTS:
                if DOF_DEF[j] == 3:
                    st[j] = qf[k, off:off + 4]
                    off += 4
                else:
                    st[j] = qf[k, off:off + 1]
                    off += 1
            self.all_states.append(st)

        # data_vel: [lin3, ang3, per-joint …] — identical numerics to the
        # shared pipeline's qvel (finite-diff + quaternion-log), but in the
        # v1 list-of-lists form with a zero first row (mocap_v1.py:92-151)
        qvel = np.asarray(clip.qvel)
        self.data_vel = [[0.0] * qvel.shape[1]] + [
            row.tolist() for row in qvel[1:]
        ]

        # data_angle: root pos + root QUAT + joint rpy/scalars (v1 quirk)
        self.data_angle = []
        for st in self.all_states:
            row = list(st["root_pos"]) + list(st["root_rot"])
            for j in BODY_JOINTS:
                if DOF_DEF[j] == 3:
                    row += quat2euler(st[j])
                else:
                    row += [float(st[j][0])]
            self.data_angle.append(row)
