#!/usr/bin/env python3
"""Capture a jax.profiler trace of the TRPO training iteration (the
per-phase evidence behind bench.py's numbers).

    python tools/profile_trace.py --num-envs 768 --out /tmp/trace
    # then: tensorboard --logdir /tmp/trace   (or inspect the .pb directly)
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-envs", type=int, default=768)
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--out", default="/tmp/dmtpu_trace")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.models import MlpPolicy

    env = DPEnvV3(clip="walk")
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size)
    cfg = TRPOConfig(horizon=args.horizon, num_envs=args.num_envs, g_step=1)
    learner = TRPO(env, policy, cfg)
    state = learner.init(jax.random.PRNGKey(0))

    # compile outside the trace
    state, _ = learner.iteration(state)
    jax.block_until_ready(state.params)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = learner.iteration(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
    steps = args.iters * cfg.horizon * cfg.num_envs
    print(f"traced {args.iters} iterations: {steps / dt:.0f} env-steps/s "
          f"→ {args.out}")


if __name__ == "__main__":
    main()
