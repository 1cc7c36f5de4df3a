"""Bundled motion-clip registry.

Clips live in ``assets/motions/*.npz`` (raw DeepMimic frames re-bundled as
numeric arrays; motion data originates from the DeepMimic project's public
mocap dataset).  Mirrors the skill set the reference ships
(/root/reference/src/mujoco/motions/, 15 clips).
"""

from __future__ import annotations

import functools
import os

from deepmimic_mujoco_tpu.mocap.loader import MocapClip, load_npz

ASSET_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "assets", "motions")
)

SKILLS = [
    "backflip", "cartwheel", "crawl", "dance_a", "dance_b",
    "getup_facedown", "getup_faceup", "jump", "kick", "punch",
    "roll", "run", "spin", "spinkick", "walk",
]


def clip_path(name: str) -> str:
    if not name.startswith("humanoid3d_"):
        name = "humanoid3d_" + name
    return os.path.join(ASSET_DIR, name + ".npz")


def available_clips() -> list[str]:
    if not os.path.isdir(ASSET_DIR):
        return []
    return sorted(
        os.path.splitext(f)[0] for f in os.listdir(ASSET_DIR) if f.endswith(".npz")
    )


@functools.lru_cache(maxsize=None)
def get_clip(name: str) -> MocapClip:
    path = clip_path(name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"No bundled clip {name!r} at {path}. Available: {available_clips()}"
        )
    return load_npz(path)
