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
    def qpos_cont(self) -> np.ndarray:
        """Temporally-continuous pose track (see :func:`continuous_qpos`):
        same rotations as :attr:`qpos`, euler branch flips and ±2π jumps
        removed.  What the imitation envs use for PD feed-forward targets,
        RSI resets and reward references under
        ``clip_velocities='consistent'``."""
        if self._qpos_cont is None:
            object.__setattr__(self, "_qpos_cont",
                               continuous_qpos(self.qpos))
        return self._qpos_cont

    _qpos_cont: Optional[np.ndarray] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def qvel_fd(self) -> np.ndarray:
        """Integrator-consistent velocities (the exact discrete inverse of
        ``engine.integrate_pos``): frame k's velocity takes qpos[k] to
        qpos[k+1] over duration[k] — world-frame FD for the root position,
        body-local quaternion log for the root rotation, ±π-wrapped FD for
        the hinge euler rates.

        The reference's ``qvel`` (kept verbatim in :attr:`qvel` for parity)
        is broken two ways (mocap_v2.py:64-76,113): ``calc_rot_vel(curr,
        prev)`` returns the NEGATED body angular velocity, and for spherical
        joints that ω-vector is stored in the euler-rxyz *rate* slots — a
        frame mismatch.  Slow clips tolerate it; fast clips (spinkick 60 fps
        spin, backflip) get reference velocities that are dynamically
        inconsistent with the pose track, which poisons RSI reset states and
        the velocity-reward targets (measured: spinkick one-step PD tracking
        reward 0.476 with the quirk arrays → 0.823 with consistent ones —
        tools/tracking_ceiling_probe.py)."""
        if self._qvel_fd is None:
            object.__setattr__(
                self, "_qvel_fd",
                consistent_qvel(self.qpos_cont, self.durations, self.loop))
        return self._qvel_fd

    _qvel_fd: Optional[np.ndarray] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def total_time(self) -> float:
        return float(self.durations.sum())

    def save_npz(self, path: str) -> None:
        """Persist the *raw* frames (data passthrough); conversion always
        re-runs in :func:`convert_frames` so the loader stays the single
        source of truth."""
        np.savez(path, frames=self.raw_frames, loop=self.loop, name=self.name)


def continuous_qpos(qpos: np.ndarray) -> np.ndarray:
    """Temporally-continuous hinge track for a converted clip.

    The per-frame euler-rxyz extraction picks whichever branch the math
    lands on; consecutive frames can flip between the two equivalent
    solutions e and (x+π, π−y, z+π) (same rotation, ±2π-far coordinates).
    The raw track is what the reference renders — but as a PD feed-forward
    or FD-velocity source a branch flip is a fake ~2π/frame jump (measured:
    spinkick's shoulder dofs spike to 178 rad/s at 4 frames; those are
    exactly the frames where one-step PD tracking collapses to ~0.04).
    This pass re-picks, per spherical triple per frame, the branch (and
    per-dof 2π shift) closest to the previous frame, and unwraps 1-dof
    joints — identical rotations, continuous coordinates."""
    out = np.array(qpos, dtype=np.float64, copy=True)
    off = 7
    for j in BODY_JOINTS:
        if DOF_DEF[j] == 3:
            for k in range(1, out.shape[0]):
                out[k, off:off + 3] = _nearest_branch(
                    out[k - 1, off:off + 3], qpos[k, off:off + 3])
            off += 3
        else:
            out[:, off] = np.unwrap(qpos[:, off])
            off += 1
    return out


def _nearest_branch(prev3: np.ndarray, e3: np.ndarray) -> np.ndarray:
    """Of the two equivalent euler-rxyz solutions for e3's rotation — e and
    (x+π, π−y, z+π) — pick the one (with per-dof 2π shifts) closest to
    ``prev3``."""
    two_pi = 2.0 * np.pi
    alt = np.array([e3[0] + np.pi, np.pi - e3[1], e3[2] + np.pi])
    best, bestd = None, np.inf
    for c in (e3, alt):
        c = c + two_pi * np.round((prev3 - c) / two_pi)
        d = np.abs(c - prev3).max()
        if d < bestd:
            best, bestd = c, d
    return best


def consistent_qvel(qpos: np.ndarray, durations: np.ndarray,
                    loop: str) -> np.ndarray:
    """(T, NV) integrator-consistent velocities for a converted pose track:
    ``engine.integrate_pos(qpos[k], qvel[k], durations[k]) == qpos[k+1]``
    exactly (root quat via the body-local exponential map, hinges linearly
    with ±π wrap).  Looping clips close the cycle: the last frame's velocity
    takes it to frame 0 shifted by the ground-plane cycle offset; non-looping
    clips hold the previous frame's velocity."""
    T = qpos.shape[0]
    qv = np.zeros((T, NV))
    nxt = np.empty_like(qpos)
    nxt[:-1] = qpos[1:]
    if loop == "wrap":
        nxt[-1] = qpos[0]
        off = qpos[-1, 0:3] - qpos[0, 0:3]
        off[2] = 0.0
        nxt[-1, 0:3] += off
        # close the cycle through the euler branch of frame 0 nearest the
        # (possibly unwrapped) last frame — a branch mismatch here would
        # fake a ~π/frame velocity on the cycle-closing row
        o = 7
        for j in BODY_JOINTS:
            if DOF_DEF[j] == 3:
                nxt[-1, o:o + 3] = _nearest_branch(
                    qpos[-1, o:o + 3], qpos[0, o:o + 3])
                o += 3
            else:
                d1 = nxt[-1, o] - qpos[-1, o]
                nxt[-1, o] = qpos[-1, o] + (
                    np.mod(d1 + np.pi, 2.0 * np.pi) - np.pi)
                o += 1
    else:
        nxt[-1] = qpos[-1]
    dt = float(durations[0])
    for k in range(T):
        # some clips store 0 for the final frame's duration (nothing follows
        # it in the file); the cycle-closing / held velocity uses the
        # nominal frame dt instead
        d = float(durations[k])
        if d <= 1e-9:
            d = dt
        qv[k, 0:3] = (nxt[k, 0:3] - qpos[k, 0:3]) / d
        # body-local ω: q_next = q ⊗ exp(ω d / 2)
        qv[k, 3:6] = qnp.rot_vel(qpos[k, 3:7], nxt[k, 3:7], d)
        dq = nxt[k, 7:] - qpos[k, 7:]
        qv[k, 6:] = (np.mod(dq + np.pi, 2.0 * np.pi) - np.pi) / d
    if loop != "wrap" and T > 1:
        qv[-1] = qv[-2]
    return qv


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
