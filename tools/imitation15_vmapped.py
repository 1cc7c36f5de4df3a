#!/usr/bin/env python3
"""Train one independent imitation policy PER bundled skill — all lanes
simultaneously in one jitted program via ``jax.vmap`` over the TRPO learner.

The reference trains one skill per process (Config.motion,
/root/reference/src/config.py:4-18) and ships 15 clips
(/root/reference/src/mujoco/motions/ ×15).  Running 15 sequential trainings
costs 15 XLA compiles (~10 min each on the hosted tunnel) plus 15
under-utilized small-batch runs; here the per-skill learners become LANES of
one vmapped TRPO iteration over the clip-indexed DPEnvV3Multi env
(reset_mode='rsi_pinned' keeps each lane on its own clip), so the whole
suite is ONE compile and one chip-saturating batch:

    lanes(15) x envs/lane(64) = 960 envs per step, one program.

A NaN in one lane stays in that lane (all ops are lane-local) — the host
loop records it and the other skills keep training, unlike the sequential
suite where a single FloatingPointError killed the run
(chainlog/imit15.log, round 4).

    python tools/imitation15_vmapped.py --iters 2200 --envs 64 \
        --out benchdata/imitation15_r5.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIPS15 = [
    "backflip", "cartwheel", "crawl", "dance_a", "dance_b",
    "getup_facedown", "getup_faceup", "jump", "kick", "punch",
    "roll", "run", "spin", "spinkick", "walk",
]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", default=",".join(CLIPS15))
    p.add_argument("--envs", type=int, default=64, help="envs per lane")
    p.add_argument("--iters", type=int, default=2200)
    p.add_argument("--horizon", type=int, default=256)
    p.add_argument("--g-step", type=int, default=3)
    p.add_argument("--save-per-iter", type=int, default=200)
    p.add_argument("--eval-episodes", type=int, default=32)
    p.add_argument("--eval-horizon", type=int, default=300)
    p.add_argument("--hidden-sizes", default="1024,512")
    p.add_argument("--fixed-logstd", type=float, default=-3.0)
    p.add_argument("--gamma", type=float, default=0.95)
    p.add_argument("--lam", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="benchdata/imitation15_r5.json")
    p.add_argument("--ckpt-root", default="train_ckpt_imit15_r5")
    p.add_argument("--log-root", default="train_logs_imit15_r5")
    p.add_argument("--resume", default=None,
                   help="path of a vmapped imit15_state.npz to continue")
    p.add_argument("--resume-lanes", action="store_true",
                   help="slice this run's --clips lanes out of --resume (a "
                        "checkpoint trained with different/more clips, lane "
                        "order --resume-clips): params + optimizer + obs-RMS "
                        "transfer, env batches re-init at the new --envs")
    p.add_argument("--resume-clips", default=",".join(CLIPS15),
                   help="clip list the --resume checkpoint was trained with "
                        "(lane order), for --resume-lanes")
    p.add_argument("--env-clips", default=None,
                   help="clip tuple to build the env over (default: --clips)."
                        "  Set to the PARENT run's full list when resuming a"
                        " lane subset: the obs clip-one-hot keeps the parent"
                        " width/indices so resumed policies see identical"
                        " features")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; evaluate --resume")
    p.add_argument("--platform", default=None)
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import rewards
    from deepmimic_mujoco_tpu.envs.multi_clip import DPEnvV3Multi
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.models import MlpPolicy
    from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range

    clips = args.clips.split(",")
    L = len(clips)
    E = args.envs
    # --env-clips decouples the env's clip tuple (and so the obs one-hot
    # width/indices) from this run's lanes: pass the parent run's full list
    # when resuming a lane subset so resumed policies see bit-identical
    # features (a 5-clip env would shrink the one-hot 15->5 and break the
    # input layer).
    env_clips = (args.env_clips.split(",") if args.env_clips else clips)
    lane_clip_ids = np.asarray([env_clips.index(c) for c in clips])
    env = DPEnvV3Multi(
        clips=tuple(env_clips), model=mocap_hinge_range(),
        control_mode="pd_residual", n_substeps=2, max_episode_steps=300,
        reward_mode="imitation_dm", obs_mode="full",
        termination="fall_contact")
    policy = MlpPolicy(
        ob_dim=env.observation_size, ac_dim=env.action_size,
        hidden_sizes=tuple(int(h) for h in args.hidden_sizes.split(",")),
        activation="relu", fixed_logstd=args.fixed_logstd)
    cfg = TRPOConfig(
        horizon=args.horizon, num_envs=E, g_step=args.g_step,
        gamma=args.gamma, lam=args.lam, reset_mode="rsi_pinned")
    learner = TRPO(env, policy, cfg)

    # ---- per-lane init: independent params, env batch pinned to the clip
    root = jax.random.PRNGKey(args.seed)
    lane_states = []
    for k in range(L):
        cid = int(lane_clip_ids[k])
        lk = jax.random.fold_in(root, k)
        st = learner.init(lk)
        ekeys = jax.random.split(jax.random.fold_in(lk, 999), E)
        idxs = jax.vmap(
            lambda kk: jax.random.randint(kk, (), 0, 1 << 30))(ekeys)
        idxs = idxs % env.clip_lens[cid]
        es = jax.vmap(lambda kk, i: env.reset_at(kk, cid, i))(ekeys, idxs)
        lane_states.append(dataclasses.replace(st, env_state=es))
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *lane_states)
    del lane_states

    if args.resume and args.resume_lanes:
        # lane surgery: the checkpoint is (L_old, ...) stacked over
        # --resume-clips; TRPOState's treedef is shape-independent, so the
        # new states work as the structure template and we slice the learned
        # lanes out.  Env batches (clip ids + E may differ) start fresh.
        src = args.resume_clips.split(",")
        idx = np.asarray([src.index(c) for c in clips])
        old = checkpoint.load(args.resume, states)
        states = dataclasses.replace(
            states,
            params=jax.tree.map(lambda a: jnp.asarray(a)[idx], old.params),
            vf_adam=jax.tree.map(lambda a: jnp.asarray(a)[idx], old.vf_adam))
        print(f"resumed lanes {list(zip(clips, idx.tolist()))} from "
              f"{args.resume}", flush=True)
    elif args.resume:
        states = checkpoint.load(args.resume, states)

    viter = jax.jit(jax.vmap(learner.iteration))

    os.makedirs(args.log_root, exist_ok=True)
    os.makedirs(args.ckpt_root, exist_ok=True)
    prog = open(os.path.join(args.log_root, "progress.jsonl"), "a")

    steps_per_iter_lane = E * args.horizon * args.g_step
    nan_lanes: set[int] = set()
    t0 = time.time()
    if not args.eval_only:
        for it in range(args.iters):
            states, stats = viter(states)
            kl = np.asarray(stats.meankl)
            bad = np.where(~np.isfinite(kl))[0]
            for b in bad:
                if int(b) not in nan_lanes:
                    print(f"!! lane {b} ({clips[b]}) went non-finite at "
                          f"iter {it}", flush=True)
                    nan_lanes.add(int(b))
            cnt = np.maximum(np.asarray(stats.ep_count), 1)
            rew = np.asarray(stats.ep_ret_sum) / cnt
            lens = np.asarray(stats.ep_len_sum) / cnt
            row = {"iter": it, "t": round(time.time() - t0, 1),
                   "ep_rew": [round(float(x), 3) for x in rew],
                   "ep_len": [round(float(x), 1) for x in lens],
                   "meankl": [round(float(x), 5) for x in kl]}
            prog.write(json.dumps(row) + "\n")
            prog.flush()
            if it % args.log_every == 0:
                sps = steps_per_iter_lane * L * (it + 1) / (time.time() - t0)
                tops = ", ".join(
                    f"{c}:{r:.0f}/{l:.0f}" for c, r, l in
                    zip(clips, rew, lens))
                print(f"[{it}/{args.iters}] {time.time()-t0:7.0f}s "
                      f"{sps:,.0f} steps/s  EpRew/EpLen {tops}", flush=True)
            if (it + 1) % args.save_per_iter == 0:
                checkpoint.save(
                    os.path.join(args.ckpt_root, "imit15_state"), states)
        checkpoint.save(os.path.join(args.ckpt_root, "imit15_state"), states)

    # ---- vmapped deterministic evaluation (one compile for all lanes) ----
    B = args.eval_episodes
    H = args.eval_horizon
    params = states.params

    def eval_lane(lane_params, lane_id, key):
        ekeys = jax.random.split(key, B)
        idxs = jax.vmap(
            lambda kk: jax.random.randint(kk, (), 0, 1 << 30))(ekeys)
        idxs = idxs % env.clip_lens[lane_id]
        s = jax.vmap(lambda kk, i: env.reset_at(kk, lane_id, i))(ekeys, idxs)

        def step_fn(carry, _):
            s, alive, ep_len, rew_sum = carry
            mean, _ = policy.mean_logstd(lane_params, s.obs)
            nxt = jax.vmap(env.step)(s, mean)
            idx = jax.vmap(lambda st: env._clip_index(
                st.clip_id, st.mocap_idx, st.init_idx)[0])(nxt)
            ref = env.clip_qpos[nxt.clip_id, idx]
            perr = jax.vmap(rewards.weighted_pose_error)(
                nxt.qpos[:, 7:], ref[:, 7:])
            ep_len = ep_len + jnp.where(alive, 1, 0)
            rew_sum = rew_sum + jnp.where(alive, nxt.reward, 0.0)
            alive2 = alive & ~nxt.done
            s2 = jax.tree.map(
                lambda a, b: jnp.where(
                    alive.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                nxt, s)
            return (s2, alive2, ep_len, rew_sum), (perr, alive)

        alive = jnp.ones(B, bool)
        carry, (perrs, alives) = jax.lax.scan(
            step_fn, (s, alive, jnp.zeros(B, jnp.int32),
                      jnp.zeros(B, jnp.float32)), None, length=H)
        _, _, ep_len, rew_sum = carry
        return ep_len, rew_sum, perrs, alives

    ev = jax.jit(jax.vmap(eval_lane))
    ep_len, rew_sum, perrs, alives = ev(
        params, jnp.asarray(lane_clip_ids),
        jax.random.split(jax.random.PRNGKey(args.seed + 11), L))
    ep_len = np.asarray(ep_len, float)      # (L, B)
    rew_sum = np.asarray(rew_sum)           # (L, B)
    mask = np.asarray(alives)               # (L, H, B)
    perr = np.asarray(perrs)                # (L, H, B)

    rows = []
    for k, c in enumerate(clips):
        m = mask[k]
        pe = float((perr[k] * m).sum() / max(m.sum(), 1))
        el = ep_len[k]
        rows.append({
            "motion": c,
            "eplen_mean": round(float(el.mean()), 1),
            "eplen_median": round(float(np.median(el)), 1),
            "horizon_cap": H,
            "eprew_mean": round(float(rew_sum[k].mean()), 2),
            "rew_per_step": round(float(rew_sum[k].mean() /
                                        max(el.mean(), 1)), 3),
            "pose_err_rad": round(pe, 3),
            "pose_err_deg": round(float(np.degrees(pe)), 1),
            "nan_lane": k in nan_lanes,
        })
    out = {
        "iters": 0 if args.eval_only else args.iters,
        "envs_per_lane": E, "horizon": args.horizon, "g_step": args.g_step,
        "steps_per_lane": (0 if args.eval_only
                           else args.iters * steps_per_iter_lane),
        "episodes": B, "joint_limits": "mocap",
        "pd_target_interp": True, "wall_s": round(time.time() - t0, 1),
        "rows": rows,
    }
    out_path = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| motion | rew/step | EpRew | EpLen | pose err (deg) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['motion']} | {r['rew_per_step']:.3f} "
              f"| {r['eprew_mean']:.1f} | {r['eplen_mean']:.0f} "
              f"| {r['pose_err_deg']:.1f} |")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
