#!/usr/bin/env python3
"""State-setting exploration study — the analogue of the reference's
``setting_states`` scripts (/root/reference/src/mujoco/setting_states.py,
src/env/setting_states.py): write mocap frames directly into qpos, derive
velocities by finite difference, and inspect the dynamics quantities the PD
controller relies on (bias force ≙ ``qfrc_bias``/``mj_rne`` with zero
acceleration, mass-matrix solve ≙ ``mj_solveM`` — see the API notes the
reference keeps as comments, setting_states.py:26-40).

Headless (the reference pops an MjViewer); prints a per-frame table.

    python tools/setting_states.py --motion walk --frames 10
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.mocap.registry import get_clip
    from deepmimic_mujoco_tpu.physics import (
        build_humanoid,
        dynamics,
        engine,
        kinematics,
    )

    clip = get_clip(args.motion)
    model = build_humanoid()
    print(f"clip {args.motion}: {len(clip)} frames @ {clip.dt:.4f}s")
    print(f"{'frame':>5} {'com_z':>7} {'|bias|':>9} {'|qacc|':>9} "
          f"{'fd_vel_err':>10}")

    for k in range(min(args.frames, len(clip) - 1)):
        qpos = jnp.asarray(clip.qpos[k])
        qvel = jnp.asarray(clip.qvel[k])
        kin = kinematics.fk(model, qpos)
        com = kinematics.mass_center(model, kin)
        # C(qpos, qvel): the bias force the reference inspects via
        # qfrc_bias / mj_rne(flg_acc=0)
        bias = dynamics.bias_force(model, kin, qvel)
        # passive forward dynamics at the set state (zero ctrl)
        fwd = engine.forward(model, qpos, qvel, jnp.zeros(model.nu))
        # finite-difference velocity check: does (frame[k+1]-frame[k])/dt
        # match the stored clip velocity? (the v1 env's velocity-consistent
        # reset, dp_env_v1.py:171-183)
        fd = (np.asarray(clip.qpos[k + 1][7:]) -
              np.asarray(clip.qpos[k][7:])) / clip.dt
        err = float(np.abs(fd - np.asarray(clip.qvel[k + 1][6:])).mean())
        print(f"{k:5d} {float(com[2]):7.3f} "
              f"{float(jnp.linalg.norm(bias)):9.2f} "
              f"{float(jnp.linalg.norm(fwd.qacc)):9.2f} {err:10.4f}")


if __name__ == "__main__":
    main()
