#!/usr/bin/env python3
"""SPMD scaling benchmark: TRPO iteration throughput vs mesh size.

Shards the env batch over an N-device mesh (params replicated — the same
data-parallel layout the reference gets from ``mpirun -np N``) and measures
end-to-end env-steps/s per mesh size.

On real multi-chip hardware this measures ICI scaling; with
``--platform cpu`` it uses XLA host-device virtualization
(``--xla_force_host_platform_device_count``) to validate the scaling *path*
(collectives compile + execute) — virtual devices share host cores, so CPU
numbers validate correctness, not speedup.

    python tools/scaling_bench.py --platform cpu --devices 1,2,4,8
    python tools/scaling_bench.py --devices 1          # real chip(s)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(n_devices: int, num_envs_per_device: int, horizon: int,
            iters: int) -> float:
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.models import MlpPolicy

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, \
        f"need {n_devices} devices, have {len(jax.devices())}"
    mesh = Mesh(np.asarray(devices), ("env",))

    env = DPEnvV3(clip="walk")
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size)
    cfg = TRPOConfig(horizon=horizon, num_envs=num_envs_per_device * n_devices,
                     g_step=1)
    learner = TRPO(env, policy, cfg)
    state = learner.init(jax.random.PRNGKey(0))

    env_s = NamedSharding(mesh, P("env"))
    repl_s = NamedSharding(mesh, P())
    place = lambda tree, s: jax.tree.map(lambda x: jax.device_put(x, s), tree)
    state = dataclasses.replace(
        state,
        params=place(state.params, repl_s),
        vf_adam=place(state.vf_adam, repl_s),
        env_state=place(state.env_state, env_s),
        new=jax.device_put(state.new, env_s),
        key=jax.device_put(state.key, repl_s),
        cur_ep_ret=jax.device_put(state.cur_ep_ret, env_s),
        cur_ep_len=jax.device_put(state.cur_ep_len, env_s),
    )

    with mesh:
        state, _ = learner.iteration(state)          # compile + warmup
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = learner.iteration(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
    return iters * cfg.g_step * cfg.horizon * cfg.num_envs / dt


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--envs-per-device", type=int, default=64)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    sizes = [int(s) for s in args.devices.split(",")]
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(sizes)}"
        ).strip()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    results = {}
    for n in sizes:
        sps = run_one(n, args.envs_per_device, args.horizon, args.iters)
        results[n] = round(sps, 1)
        base = results[sizes[0]]
        print(json.dumps({
            "devices": n, "env_steps_per_s": results[n],
            "scaling_efficiency": round(results[n] / (base * n / sizes[0]), 3),
        }))


if __name__ == "__main__":
    main()
