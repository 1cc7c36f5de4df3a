#!/usr/bin/env python3
"""GAIL training CLI — the reference's ``gail.py __main__``
(/root/reference/src/gail.py:372-404,496-597) with the same hyperparameter
surface (expert .npz path, traj_limitation, adversary hidden/entcoeff,
g_step/d_step, BC pretraining flag)."""

from __future__ import annotations

import argparse
import os
import time
from collections import deque

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env-id", default="DPEnvV3")
    p.add_argument("--motion", default="walk")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--expert-path", required=True)
    p.add_argument("--traj-limitation", type=int, default=-1)
    # gail.py:503-514 defaults
    p.add_argument("--g-step", type=int, default=3)
    p.add_argument("--d-step", type=int, default=1)
    p.add_argument("--num-timesteps", type=int, default=5_000_000)
    p.add_argument("--timesteps-per-batch", type=int, default=1024)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--max-kl", type=float, default=0.01)
    p.add_argument("--policy-entcoeff", type=float, default=0.0)
    p.add_argument("--adversary-entcoeff", type=float, default=1e-3)
    p.add_argument("--adversary-hidden-size", type=int, default=100)
    p.add_argument("--d-stepsize", type=float, default=3e-4)
    p.add_argument("--d-exact", type=int, default=1,
                   help="1 = reference d-step semantics (sequential sweep "
                        "of the whole policy batch + expert cursor, "
                        "gail.py:329-343); 0 = r1 random subsamples")
    p.add_argument("--pretrained", action="store_true",
                   help="behavior-cloning pretraining (gail.py:491-495)")
    p.add_argument("--bc-max-iters", type=int, default=10_000)
    p.add_argument("--checkpoint-dir", default="checkpoint_tmp")
    p.add_argument("--log-dir", default="log_tmp")
    p.add_argument("--num-iters", type=int, default=0)
    p.add_argument("--platform", default=None)
    # env/policy configuration (mirrors train_trpo) — needed to run GAIL on
    # the imitation surface the expert data was sampled from, not just the
    # reference's default standup env
    p.add_argument("--reward-mode", default="alive",
                   choices=["alive", "mocap", "imitation", "imitation_dm"],
                   help="TRUE-reward env config; the learning signal is "
                        "always the discriminator's (gail.py:78-87)")
    p.add_argument("--control-mode", default="torque",
                   choices=["torque", "pd", "pd_residual"])
    p.add_argument("--n-substeps", type=int, default=1)
    p.add_argument("--max-episode-steps", type=int, default=0)
    p.add_argument("--obs-mode", default=None, choices=["legacy", "full"])
    p.add_argument("--termination", default=None,
                   choices=["com", "fall_contact"])
    p.add_argument("--reset-mode", default="noise",
                   choices=["noise", "rsi"])
    p.add_argument("--fixed-logstd", type=float, default=None)
    p.add_argument("--hidden-sizes", default=None,
                   help="comma list, e.g. 1024,512")
    p.add_argument("--activation", default="tanh", choices=["tanh", "relu"])
    p.add_argument("--save-per-iter", type=int, default=100)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from deepmimic_mujoco_tpu.algos.bc import behavior_clone
    from deepmimic_mujoco_tpu.algos.dataset import MujocoDset
    from deepmimic_mujoco_tpu.algos.gail import GAIL, GAILConfig
    from deepmimic_mujoco_tpu.algos.trpo import TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV3
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.models import MlpPolicy
    from deepmimic_mujoco_tpu.utils import logger

    env = DPEnvV3(
        clip=args.motion, reward_mode=args.reward_mode,
        control_mode=args.control_mode, n_substeps=args.n_substeps,
        max_episode_steps=args.max_episode_steps, obs_mode=args.obs_mode,
        termination=args.termination)
    hidden_sizes = (tuple(int(h) for h in args.hidden_sizes.split(","))
                    if args.hidden_sizes else None)
    policy = MlpPolicy(ob_dim=env.observation_size, ac_dim=env.action_size,
                       fixed_logstd=args.fixed_logstd,
                       hidden_sizes=hidden_sizes, activation=args.activation)
    dset = MujocoDset(args.expert_path, traj_limitation=args.traj_limitation)
    assert dset.obs.shape[1] == env.observation_size, (
        f"expert obs dim {dset.obs.shape[1]} != env obs dim "
        f"{env.observation_size} — the expert data was sampled under a "
        "different env configuration (obs-mode / reward-mode / phase)")

    cfg = GAILConfig(
        trpo=TRPOConfig(
            horizon=args.timesteps_per_batch, num_envs=args.num_envs,
            g_step=args.g_step, max_kl=args.max_kl,
            entcoeff=args.policy_entcoeff, reset_mode=args.reset_mode,
        ),
        d_step=args.d_step, d_stepsize=args.d_stepsize,
        d_exact=bool(args.d_exact),
    )
    learner = GAIL(
        env, policy, dset.obs, dset.acs, cfg,
        adversary_hidden=args.adversary_hidden_size,
        adversary_entcoeff=args.adversary_entcoeff,
    )
    state = learner.init(jax.random.PRNGKey(args.seed))

    if args.pretrained:
        params = behavior_clone(
            policy, state.trpo.params, dset,
            max_iters=args.bc_max_iters, seed=args.seed)
        import dataclasses

        state = dataclasses.replace(
            state, trpo=dataclasses.replace(state.trpo, params=params))

    name = f"{args.env_id}/gail-{args.motion}-{args.seed}"
    log_dir = os.path.join(args.log_dir, name)
    ckpt_dir = os.path.join(args.checkpoint_dir, name)
    logger.configure(log_dir)
    from deepmimic_mujoco_tpu.utils.monitor import Monitor

    monitor = Monitor(os.path.join(log_dir, "monitor.json"))

    lenbuffer, rewbuffer, truebuffer = (deque(maxlen=40) for _ in range(3))
    timesteps = 0
    iters = 0
    tstart = time.time()
    while True:
        if args.num_iters and iters >= args.num_iters:
            break
        if not args.num_iters and timesteps >= args.num_timesteps:
            break
        state, stats = learner.iteration(state)
        t = stats.trpo
        n_ep = int(t.ep_count)
        if n_ep:
            # true per-episode rows in completion order; the monitor records
            # the TRUE env reward (the reference logs true rewards while the
            # learning signal is the discriminator's, gail.py:78-87)
            lens = np.asarray(t.ep_lens).reshape(-1)
            rets = np.asarray(t.ep_rets).reshape(-1)
            trues = np.asarray(stats.true_ep_rets).reshape(-1)
            ended = lens > 0
            for r, tr, l in zip(rets[ended], trues[ended], lens[ended]):
                rewbuffer.append(float(r))
                truebuffer.append(float(tr))
                lenbuffer.append(int(l))
                monitor.record(float(tr), int(l))
        timesteps += int(t.timesteps)
        iters += 1
        logger.record_tabular("EpLenMean", np.mean(lenbuffer) if lenbuffer else np.nan)
        logger.record_tabular("EpRewMean", np.mean(rewbuffer) if rewbuffer else np.nan)
        logger.record_tabular("EpTrueRewMean", np.mean(truebuffer) if truebuffer else np.nan)
        logger.record_tabular("DLoss", float(stats.d_loss))
        logger.record_tabular("GenAcc", float(stats.gen_acc))
        logger.record_tabular("ExpertAcc", float(stats.exp_acc))
        logger.record_tabular("TimestepsSoFar", timesteps)
        logger.record_tabular("TimeElapsed", time.time() - tstart)
        logger.dump_tabular()
        if iters % args.save_per_iter == 0:
            checkpoint.save(os.path.join(ckpt_dir, "gail_state"), state)
    checkpoint.save(os.path.join(ckpt_dir, "gail_state"), state)
    monitor.close()


if __name__ == "__main__":
    main()
