#!/usr/bin/env python3
"""Benchmark: end-to-end TRPO training throughput (env-steps/s) on the
current accelerator.

Prints ONE JSON line:
  {"metric": "trpo_env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N / 460, "num_envs": B, "phase_ms": {...},
   "sweep": {B: steps_per_s, ...}}

Baseline: the reference's bundled TRPO run sustains ~460 env-steps/s
end-to-end (sampling + update, 1 worker) — BASELINE.md.  Here sampling and
the full TRPO update run inside one jitted program over a vmapped env batch.

Env knobs:
  BENCH_NUM_ENVS   headline batch (default 768 — measured optimum on v5e)
  BENCH_HORIZON    segment length (64)
  BENCH_ITERS      timed iterations (5)
  BENCH_SWEEP      "512,768,2048,4096" to also measure other batch sizes
  BENCH_BREAKDOWN  1 → per-phase (rollout / policy+CG / vf) timings
  BENCH_PLATFORM   force jax platform
"""

import json
import os
import time


def _time(fn, block, iters):
    fn()          # compile + warmup
    block()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    block()
    return (time.perf_counter() - t0) / iters, out


def measure(num_envs: int, horizon: int, iters: int, breakdown: bool):
    import dataclasses

    import jax

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.models import MlpPolicy
    from deepmimic_mujoco_tpu.physics import build_humanoid

    # BENCH_CONTACT_CAP / BENCH_LIMIT_CAP: top-k constraint caps (ne =
    # 3*contact_cap + limit_cap; the dual matrix is (ne, ne)) — A/B knob,
    # accuracy study in tools/contactcap_study.py; unset = framework default
    cap_kwargs = {}
    if os.environ.get("BENCH_CONTACT_CAP", ""):
        cap_kwargs["contact_cap"] = int(os.environ["BENCH_CONTACT_CAP"])
    if os.environ.get("BENCH_LIMIT_CAP", ""):
        cap_kwargs["limit_cap"] = int(os.environ["BENCH_LIMIT_CAP"])
    model = build_humanoid(**cap_kwargs)
    # BENCH_WARM=K: warm-started constraint solves at K iterations
    # (PhysicsModel.warm_iterations) — A/B knob for the default setting
    warm = int(os.environ.get("BENCH_WARM", "-1"))
    if warm >= 0:
        model = dataclasses.replace(model, warm_iterations=warm)
    # BENCH_SOLVER_DTYPE=bf16: store the APGD dual matrix in bf16
    sdtype = os.environ.get("BENCH_SOLVER_DTYPE", "")
    if sdtype:
        model = dataclasses.replace(model, solver_dtype=sdtype)
    # BENCH_STAGE_REUSE=kin / BENCH_STAGE_ITERS=K: stage-frozen kinematics
    # across RK4 stages + reduced budget for stages 2-4
    # (PhysicsModel.stage_reuse / stage_iterations) — A/B knobs
    if os.environ.get("BENCH_STAGE_REUSE", ""):
        model = dataclasses.replace(
            model, stage_reuse=os.environ["BENCH_STAGE_REUSE"])
    if os.environ.get("BENCH_STAGE_ITERS", ""):
        model = dataclasses.replace(
            model, stage_iterations=int(os.environ["BENCH_STAGE_ITERS"]))
    env = DPEnvV3(clip="walk", model=model)
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size)
    cfg = TRPOConfig(horizon=horizon, num_envs=num_envs, g_step=1)
    learner = TRPO(env, policy, cfg)

    state = learner.init(jax.random.PRNGKey(0))
    holder = {"state": state}

    def full():
        holder["state"], stats = learner.iteration(holder["state"])
        return stats

    dt, _ = _time(full, lambda: jax.block_until_ready(holder["state"].params),
                  iters)
    steps = cfg.g_step * cfg.horizon * cfg.num_envs
    out = {"steps_per_s": steps / dt, "iter_ms": dt * 1e3}

    # XLA cost analysis of the compiled iteration: model FLOPs + HBM bytes
    # → MFU vs the v5e bf16 MXU peak (197 TFLOP/s) and streaming bandwidth.
    # The program is f32-dominated, so mfu_vs_bf16_peak understates use of
    # the f32 pipeline by ~2× — it is a cross-round-comparable utilization
    # index, not a roofline claim.
    try:
        compiled = type(learner).iteration.lower(learner, state).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        if flops > 0:
            out["flops_per_iter"] = flops
            out["tflops_per_s"] = flops / dt / 1e12
            out["mfu_vs_bf16_peak"] = flops / dt / 197e12
        if byts > 0:
            out["hbm_gb_per_s"] = byts / dt / 1e9
            if flops > 0:
                out["arith_intensity"] = flops / byts
        if flops > 0 or byts > 0:
            # XLA cost_analysis counts each while/scan BODY once, not
            # trip-count times — the rollout scan (horizon × substeps ×
            # APGD passes) is therefore understated by orders of magnitude.
            # Comparable across rounds, not an absolute roofline position
            # (the measured-bandwidth analysis lives in BASELINE.md).
            out["cost_analysis_note"] = "loop bodies counted once"
    except Exception:
        pass

    if breakdown:
        state = holder["state"]

        rollout = jax.jit(lambda p, es, nw, k, er, el: learner._rollout(
            p, es, nw, k, er, el))

        seg_holder = {}

        def roll():
            seg, es, nw, k, er, el = rollout(
                state.params, state.env_state, state.new, state.key,
                state.cur_ep_ret, state.cur_ep_len)
            seg_holder["seg"] = seg
            return seg

        dt_roll, seg = _time(
            roll, lambda: jax.block_until_ready(seg_holder["seg"]["ob"]),
            iters)

        upd = jax.jit(lambda p, va, seg, k: learner._segment_update(
            p, va, seg, k))
        upd_holder = {}

        def update():
            out = upd(state.params, state.vf_adam, seg, state.key)
            upd_holder["p"] = out[0]
            return out

        dt_upd, _ = _time(
            update, lambda: jax.block_until_ready(upd_holder["p"]["pol"]),
            iters)
        out["phase_ms"] = {
            "rollout": round(dt_roll * 1e3, 2),
            "update": round(dt_upd * 1e3, 2),
            "full_iter": round(dt * 1e3, 2),
        }
        # rollout-only throughput bounds the physics+policy speed of light
        out["rollout_steps_per_s"] = steps / dt_roll
    return out


def main() -> None:
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # seed from benchdata/warm_jax_cache/ + enable the repo-local cache so
    # the driver's bench never pays a cold multi-minute tunnel compile
    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 768))
    horizon = int(os.environ.get("BENCH_HORIZON", 64))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    # per-phase breakdown is on by default (BENCH_BREAKDOWN=0 disables)
    breakdown = os.environ.get("BENCH_BREAKDOWN", "1") not in ("0", "")
    # default sweep: the batch-scaling envelope (768/2048/4096) rides in the
    # driver-visible payload — the v5e-16 projection rests on it.
    # BENCH_SWEEP overrides the list; BENCH_SWEEP=0 disables.
    sweep_env = os.environ.get("BENCH_SWEEP", "768,2048,4096")
    if sweep_env in ("0", "none"):
        sweep_env = ""

    result = measure(num_envs, horizon, iters, breakdown)
    payload = {
        "metric": "trpo_env_steps_per_s",
        "value": round(result["steps_per_s"], 1),
        "unit": "steps/s",
        "vs_baseline": round(result["steps_per_s"] / 460.0, 2),
        "num_envs": num_envs,
    }
    for k in ("tflops_per_s", "mfu_vs_bf16_peak", "hbm_gb_per_s",
              "arith_intensity"):
        if k in result:
            payload[k] = round(result[k], 4)
    if breakdown:
        payload["phase_ms"] = result["phase_ms"]
        payload["rollout_steps_per_s"] = round(result["rollout_steps_per_s"], 1)
    if sweep_env:
        sweep = {}
        for b in (int(x) for x in sweep_env.split(",")):
            if b == num_envs:
                sweep[b] = round(result["steps_per_s"], 1)
                continue
            sweep[b] = round(measure(b, horizon, iters, False)["steps_per_s"], 1)
        payload["sweep"] = sweep
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
