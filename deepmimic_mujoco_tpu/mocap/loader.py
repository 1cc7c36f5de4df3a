"""DeepMimic motion-clip pipeline.

Loads DeepMimic JSON clips (``{"Loop": ..., "Frames": [[dt, root_pos3,
root_quat4, <dp-order joint quats/scalars>], ...]}``) or pre-imported ``.npz``
bundles, and converts them to MuJoCo-layout configuration/velocity arrays
ready to become device arrays.

Parity target: ``MocapDM.read_raw_data`` / ``convert_raw_data``
(/root/reference/src/mujoco/mocap_v2.py:24-149), including its quirks:

* frame k's velocity uses duration[k-1] (duration[0] for k=0, where vel≡0);
* angular velocities are computed with (curr, prev) argument order — i.e. the
  *negated* local-frame angular velocity — and written into qvel anyway;
* spherical joint quats → euler 'rxyz' hinge triplets;
* Y-up → Z-up alignment of all positions/rotations.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from deepmimic_mujoco_tpu.mocap import _quat_np as qnp
from deepmimic_mujoco_tpu.mocap.constants import (
    BODY_JOINTS,
    BODY_JOINTS_IN_DP_ORDER,
    DOF_DEF,
    NQ,
    NV,
)


@dataclasses.dataclass
class MocapClip:
    """A converted motion clip (host numpy, float64).

    Attributes
    ----------
    name:       clip name (e.g. ``humanoid3d_walk``)
    loop:       ``"wrap"`` or ``"none"``
    dt:         nominal frame duration (first frame's duration)
    durations:  (T,) per-frame durations
    qpos:       (T, 35) MuJoCo-layout configuration
                [root_pos3, root_quat4(wxyz), per-joint euler-rxyz/scalar]
    qvel:       (T, 34) MuJoCo-layout velocity (reference quirk semantics)
    quat_frames:(T, 44) aligned quaternion-form frames in *MuJoCo joint order*
                [duration, root_pos3, root_quat4, per-joint quat4/scalar]
                (the reference's ``MocapDM.data``)
    raw_frames: (T, 44) original unaligned file frames (durations intact)
    """

    name: str
    loop: str
    dt: float
    durations: np.ndarray
    qpos: np.ndarray
    qvel: np.ndarray
    quat_frames: np.ndarray
    raw_frames: np.ndarray

    def __len__(self) -> int:
        return self.qpos.shape[0]

    @property
    def total_time(self) -> float:
        return float(self.durations.sum())

    def save_npz(self, path: str) -> None:
        """Persist the *raw* frames (data passthrough); conversion always
        re-runs in :func:`convert_frames` so the loader stays the single
        source of truth."""
        np.savez(path, frames=self.raw_frames, loop=self.loop, name=self.name)


def _parse_frame(frame: np.ndarray) -> dict:
    """Split one raw frame into aligned root + dp-order joint states
    (/root/reference/src/mujoco/mocap_v2.py:44-59)."""
    state = {}
    state["root_pos"] = qnp.align_position(frame[1:4])
    state["root_rot"] = qnp.align_rotation(frame[4:8])
    off = 8
    for joint in BODY_JOINTS_IN_DP_ORDER:
        dof = DOF_DEF[joint]
        if dof == 1:
            state[joint] = frame[off:off + 1].copy()
            off += 1
        elif dof == 3:
            state[joint] = qnp.align_rotation(frame[off:off + 4])
            off += 4
    return state


def convert_frames(frames: np.ndarray, loop: str = "wrap",
                   name: str = "clip") -> MocapClip:
    """Raw (T, 44) DeepMimic frames → :class:`MocapClip`."""
    frames = np.asarray(frames, dtype=np.float64)
    T = frames.shape[0]
    durations = frames[:, 0].copy()
    dt = float(durations[0])

    states = [_parse_frame(frames[k]) for k in range(T)]

    quat_frames = np.full((T, frames.shape[1]), np.nan)
    qpos = np.zeros((T, NQ))
    qvel = np.zeros((T, NV))

    for k in range(T):
        st = states[k]
        dura = durations[k] if k == 0 else durations[k - 1]
        quat_frames[k, 0] = dura
        quat_frames[k, 1:4] = st["root_pos"]
        quat_frames[k, 4:8] = st["root_rot"]

        qpos[k, 0:3] = st["root_pos"]
        qpos[k, 3:7] = st["root_rot"]
        if k == 0:
            qvel[k, 0:6] = 0.0
        else:
            qvel[k, 0:3] = (quat_frames[k, 1:4] - quat_frames[k - 1, 1:4]) / dura
            # Reference argument order (curr, prev): mocap_v2.py:113
            qvel[k, 3:6] = qnp.rot_vel(quat_frames[k, 4:8], quat_frames[k - 1, 4:8], dura)

        off_q = 8  # into quat_frames
        off_p = 7  # into qpos
        off_v = 6  # into qvel
        for joint in BODY_JOINTS:
            dof = DOF_DEF[joint]
            if dof == 1:
                quat_frames[k, off_q] = st[joint][0]
                qpos[k, off_p] = st[joint][0]
                if k > 0:
                    qvel[k, off_v] = (quat_frames[k, off_q] - quat_frames[k - 1, off_q]) / dura
                off_q += 1
                off_p += 1
                off_v += 1
            else:
                quat_frames[k, off_q:off_q + 4] = st[joint]
                qpos[k, off_p:off_p + 3] = qnp.euler_rxyz(st[joint])
                if k > 0:
                    qvel[k, off_v:off_v + 3] = qnp.rot_vel(
                        quat_frames[k, off_q:off_q + 4],
                        quat_frames[k - 1, off_q:off_q + 4],
                        dura,
                    )
                off_q += 4
                off_p += 3
                off_v += 3

    return MocapClip(
        name=name,
        loop=loop,
        dt=dt,
        durations=durations,
        qpos=qpos,
        qvel=qvel,
        quat_frames=quat_frames,
        raw_frames=frames,
    )


def load_deepmimic_json(path: str, name: Optional[str] = None) -> MocapClip:
    """Load a DeepMimic-format JSON motion file (reference-compatible)."""
    with open(path, "r") as fin:
        data = json.load(fin)
    frames = np.asarray(data["Frames"], dtype=np.float64)
    loop = str(data.get("Loop", "wrap"))
    if name is None:
        name = os.path.splitext(os.path.basename(path))[0]
    return convert_frames(frames, loop=loop, name=name)


def load_npz(path: str) -> MocapClip:
    """Load a clip bundled as ``.npz`` (see :meth:`MocapClip.save_npz`)."""
    with np.load(path, allow_pickle=False) as z:
        frames = np.asarray(z["frames"], dtype=np.float64)
        loop = str(z["loop"])
        name = str(z["name"])
    return convert_frames(frames, loop=loop, name=name)


def load_clip(path_or_name: str) -> MocapClip:
    """Load by file path (.txt/.json DeepMimic format or .npz bundle) or by
    bundled clip name (see :mod:`deepmimic_mujoco_tpu.mocap.registry`)."""
    if os.path.exists(path_or_name):
        if path_or_name.endswith(".npz"):
            return load_npz(path_or_name)
        return load_deepmimic_json(path_or_name)
    from deepmimic_mujoco_tpu.mocap.registry import get_clip
    return get_clip(path_or_name)
