#!/usr/bin/env python3
"""Render one lane of a vmapped multi-skill checkpoint
(tools/imitation15_vmapped.py) to video via host MuJoCo.

    python tools/render_vmapped.py --ckpt train_ckpt_imit5_r5/imit15_state.npz \
        --clips walk,run,spinkick,backflip,getup_facedown \
        --env-clips <15-clip list> --motion spinkick --out figures/spinkick_r5.avi
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

os.environ.setdefault("MUJOCO_GL", "egl")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sys.path.insert(0, os.path.join(REPO, "tools"))
from imitation15_vmapped import CLIPS15  # noqa: E402  (same tools dir)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--clips", required=True,
                   help="lane order the checkpoint was trained with")
    p.add_argument("--env-clips", default=",".join(CLIPS15))
    p.add_argument("--motion", required=True, help="lane to render")
    p.add_argument("--out", default=None)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--start-frame", type=int, default=0)
    p.add_argument("--hidden-sizes", default="1024,512")
    p.add_argument("--fixed-logstd", type=float, default=-3.0)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs.multi_clip import DPEnvV3Multi
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.io_utils.video import render_qpos_trajectory
    from deepmimic_mujoco_tpu.models import MlpPolicy
    from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range

    clips = args.clips.split(",")
    env_clips = args.env_clips.split(",")
    lane = clips.index(args.motion)
    cid = env_clips.index(args.motion)

    env = DPEnvV3Multi(
        clips=tuple(env_clips), model=mocap_hinge_range(),
        control_mode="pd_residual", n_substeps=2,
        max_episode_steps=args.steps, reward_mode="imitation_dm",
        obs_mode="full", termination="fall_contact")
    policy = MlpPolicy(
        ob_dim=env.observation_size, ac_dim=env.action_size,
        hidden_sizes=tuple(int(h) for h in args.hidden_sizes.split(",")),
        activation="relu", fixed_logstd=args.fixed_logstd)
    learner = TRPO(env, policy, TRPOConfig(
        num_envs=2, horizon=8, reset_mode="rsi_pinned"))

    # lane-stacked template -> load -> slice the lane
    L = len(clips)
    sts = []
    for k in range(L):
        st = learner.init(jax.random.fold_in(jax.random.PRNGKey(0), k))
        ekeys = jax.random.split(jax.random.PRNGKey(k), 2)
        es = jax.vmap(lambda kk: env.reset_at(
            kk, env_clips.index(clips[k]), 0))(ekeys)
        sts.append(dataclasses.replace(st, env_state=es))
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    states = checkpoint.load(args.ckpt, states)
    params = jax.tree.map(lambda a: a[lane], states.params)

    s = env.reset_at(jax.random.PRNGKey(0), cid, args.start_frame)

    @jax.jit
    def roll(s):
        def step_fn(carry, _):
            s, alive = carry
            mean, _ = policy.mean_logstd(params, s.obs)
            nxt = env.step(s, mean)
            alive2 = alive & ~nxt.done
            s2 = jax.tree.map(lambda a, b: jnp.where(alive, a, b), nxt, s)
            return (s2, alive2), (s.qpos, alive)

        (_, _), (qpos, alive) = jax.lax.scan(
            step_fn, (s, jnp.ones((), bool)), None, length=args.steps)
        return qpos, alive

    qpos, alive = roll(s)
    qpos = np.asarray(qpos)[np.asarray(alive)]
    out = args.out or f"figures/{args.motion}_r5.avi"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    render_qpos_trajectory(qpos, out, fps=int(round(1.0 / (env.model.dt * 2))))
    print(f"rendered {len(qpos)} frames -> {out}")


if __name__ == "__main__":
    main()
