#!/usr/bin/env python3
"""Benchmark: end-to-end TRPO training throughput (env-steps/s) on the
current accelerator.

Prints ONE JSON line:
  {"metric": "trpo_env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N / 460}

Baseline: the reference's bundled TRPO run sustains ~460 env-steps/s
end-to-end (sampling + update, 1 worker) — BASELINE.md.  Here sampling and
the full TRPO update run inside one jitted program over a vmapped env batch.

Env knobs: BENCH_NUM_ENVS (default 512), BENCH_HORIZON (64), BENCH_ITERS (5).
"""

import json
import os
import time


def main() -> None:
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.models import MlpPolicy

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 768))
    horizon = int(os.environ.get("BENCH_HORIZON", 64))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    env = DPEnvV3(clip="walk")
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size)
    cfg = TRPOConfig(horizon=horizon, num_envs=num_envs, g_step=1)
    learner = TRPO(env, policy, cfg)

    state = learner.init(jax.random.PRNGKey(0))
    # compile + warmup
    state, _ = learner.iteration(state)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = learner.iteration(state)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    steps = iters * cfg.g_step * cfg.horizon * cfg.num_envs
    sps = steps / dt
    print(json.dumps({
        "metric": "trpo_env_steps_per_s",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 460.0, 2),
    }))


if __name__ == "__main__":
    main()
