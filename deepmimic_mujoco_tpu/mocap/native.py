"""ctypes bindings for the native (C++) mocap ingestion library.

``libdmtpu_mocap.so`` implements the clip JSON parser and the frame→qpos/qvel
conversion with the exact loader semantics; it serves as the accelerated
batch-import path and as an independent oracle cross-validating the Python
pipeline (tests/test_native.py).  Auto-builds with g++ on first use; all
entry points raise ``NativeUnavailable`` if no toolchain is present so the
pure-Python path remains the fallback."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdmtpu_mocap.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure
            raise NativeUnavailable(f"could not build {_LIB_PATH}: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dmtpu_convert_frames.restype = ctypes.c_int
    lib.dmtpu_convert_frames.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.dmtpu_parse_clip.restype = ctypes.c_int64
    lib.dmtpu_parse_clip.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def convert_frames(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(T, 44) raw frames → (qpos (T,35), qvel (T,34)) via the native path."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.float64)
    T, W = frames.shape
    qpos = np.zeros((T, 35))
    qvel = np.zeros((T, 34))
    rc = lib.dmtpu_convert_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), T, W,
        qpos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        qvel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise ValueError(f"native conversion failed (rc={rc})")
    return qpos, qvel


def parse_clip(path: str) -> tuple[np.ndarray, str]:
    """DeepMimic JSON file → (frames (T,44), loop) via the native parser."""
    lib = _load()
    cap = 64 * 1024 * 44
    buf = np.zeros(cap)
    loop = ctypes.create_string_buffer(32)
    T = lib.dmtpu_parse_clip(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap, loop, 32)
    if T < 0:
        raise ValueError(f"native parse failed for {path}")
    return buf[: T * 44].reshape(T, 44).copy(), loop.value.decode()


def load_clip_native(path: str):
    """Full native ingestion → MocapClip (parse + convert in C++)."""
    from deepmimic_mujoco_tpu.mocap.loader import MocapClip

    frames, loop = parse_clip(path)
    qpos, qvel = convert_frames(frames)
    name = os.path.splitext(os.path.basename(path))[0]
    # quat_frames retained from the python path only when needed; rebuild
    # minimal metadata here
    durations = frames[:, 0].copy()
    return MocapClip(
        name=name, loop=loop, dt=float(durations[0]), durations=durations,
        qpos=qpos, qvel=qvel, quat_frames=np.zeros((len(frames), 44)),
        raw_frames=frames)
