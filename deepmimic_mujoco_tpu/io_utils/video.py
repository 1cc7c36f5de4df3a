"""Video export (reference: /root/reference/src/VideoSaver.py) — host-side
OpenCV writer, plus a MuJoCo-renderer helper that renders qpos trajectories
from the JAX engine through the exported MJCF for visual parity checks."""

from __future__ import annotations

from typing import Optional

import numpy as np


class VideoSaver:
    """MJPG/avi frame dump (VideoSaver.py:13-47)."""

    def __init__(self, width: int = 640, height: int = 480, fps: int = 60,
                 output_path: str = "video.avi"):
        import cv2

        self.width = width
        self.height = height
        self.writer = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (width, height))

    def add_frame(self, frame: np.ndarray) -> None:
        import cv2

        if frame.shape[1::-1] != (self.width, self.height):
            frame = cv2.resize(frame, (self.width, self.height))
        self.writer.write(frame[..., ::-1])  # RGB → BGR

    def close(self) -> None:
        self.writer.release()


def render_qpos_trajectory(qpos_traj: np.ndarray, out_path: str,
                           fps: Optional[int] = None, width: int = 640,
                           height: int = 480) -> str:
    """Render a (T, nq) qpos trajectory to video via host MuJoCo (rendering
    stays off-device; SURVEY.md §2.6)."""
    import mujoco

    from deepmimic_mujoco_tpu.physics.humanoid import to_mjcf

    m = mujoco.MjModel.from_xml_string(to_mjcf(visual=True))
    d = mujoco.MjData(m)
    renderer = mujoco.Renderer(m, height=height, width=width)
    saver = VideoSaver(width=width, height=height,
                       fps=fps or int(round(1.0 / m.opt.timestep)),
                       output_path=out_path)
    for qpos in np.asarray(qpos_traj):
        d.qpos[:] = qpos
        mujoco.mj_forward(m, d)
        renderer.update_scene(d)
        saver.add_frame(renderer.render())
    saver.close()
    return out_path
