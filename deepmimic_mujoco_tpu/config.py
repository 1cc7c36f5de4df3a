"""Global experiment config — the reference's static ``Config`` selector
(/root/reference/src/config.py): one switch choosing which motion/skill every
env trains on, plus path resolution for clips.

Unlike the reference (hardcoded absolute paths), clips resolve through the
bundled registry or explicit paths, and the motion can be overridden via the
``DMTPU_MOTION`` env var or :func:`set_motion`."""

from __future__ import annotations

import os


class Config:
    all_motions = [
        "backflip", "cartwheel", "crawl", "dance_a", "dance_b",
        "getup_facedown", "getup_faceup", "jump", "kick", "punch",
        "roll", "run", "spin", "spinkick", "walk",
    ]
    curr_path = os.path.dirname(os.path.abspath(__file__))
    motion = os.environ.get("DMTPU_MOTION", "walk")
    env_name = "dp_env_v3"

    @classmethod
    def motion_name(cls) -> str:
        return f"humanoid3d_{cls.motion}"

    @classmethod
    def mocap_path(cls) -> str:
        return os.path.join(
            cls.curr_path, "..", "assets", "motions", cls.motion_name() + ".npz")


def set_motion(name: str) -> None:
    if name.startswith("humanoid3d_"):
        name = name[len("humanoid3d_"):]
    assert name in Config.all_motions, f"unknown motion {name!r}"
    Config.motion = name
