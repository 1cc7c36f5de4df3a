"""Host-side training driver: wraps the jitted TRPO iteration with logging,
episode monitoring, checkpointing — the glue the reference spreads over
``learn``'s outer loop (/root/reference/src/trpo.py:195-319)."""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Optional

import jax
import numpy as np

from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOState
from deepmimic_mujoco_tpu.io_utils import checkpoint
from deepmimic_mujoco_tpu.utils import logger
from deepmimic_mujoco_tpu.utils.monitor import Monitor


def train(
    learner: TRPO,
    seed: int = 0,
    max_timesteps: int = 0,
    max_iters: int = 0,
    ckpt_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
    save_per_iter: int = 100,
    resume_from: Optional[str] = None,
    verbose: bool = True,
    override_logstd: Optional[float] = None,
) -> TRPOState:
    """``override_logstd``: set the (fixed) exploration logstd AFTER loading
    a resume checkpoint — the checkpointed value would otherwise win, which
    makes noise-annealing polish phases impossible."""
    assert (max_timesteps > 0) ^ (max_iters > 0), \
        "specify exactly one of max_timesteps / max_iters (trpo.py:202)"

    if log_dir is not None:
        logger.configure(log_dir)
        monitor = Monitor(os.path.join(log_dir, "monitor.json"))
    else:
        monitor = None

    state = learner.init(jax.random.PRNGKey(seed))
    if resume_from is not None:
        state = checkpoint.load(resume_from, state)
    if override_logstd is not None:
        import dataclasses

        import jax.numpy as jnp

        params = dict(state.params)
        params["logstd"] = jnp.full_like(params["logstd"],
                                         float(override_logstd))
        state = dataclasses.replace(state, params=params)

    lenbuffer: deque = deque(maxlen=40)
    rewbuffer: deque = deque(maxlen=40)
    episodes_so_far = 0
    timesteps_so_far = 0
    counted_so_far = 0  # reference-style counter (see IterStats.ep_len_sum_last)
    iters_so_far = 0
    tstart = time.time()

    while True:
        if max_timesteps and timesteps_so_far >= max_timesteps:
            break
        if max_iters and iters_so_far >= max_iters:
            break

        if ckpt_dir is not None and iters_so_far % save_per_iter == 0:
            checkpoint.save(os.path.join(ckpt_dir, "trpo_state"), state)

        state, stats = learner.iteration(state)

        # NaN tripwire (the reference asserts finite steps, trpo.py:257, and
        # rejects non-finite line-search losses, trpo.py:272-273; here a
        # corrupted state would otherwise propagate silently across iters)
        if not np.isfinite(float(stats.meankl)):
            raise FloatingPointError(
                f"non-finite meankl at iter {iters_so_far}; "
                "aborting (resume from the last checkpoint)")

        ep_count = int(stats.ep_count)
        if ep_count > 0:
            if stats.ep_lens is not None:
                # true per-episode records in completion order (reference
                # bench/monitor.py:58-76 writes one row per episode; the
                # deques then hold real episodes, not repeated means)
                lens = np.asarray(stats.ep_lens).reshape(-1)
                rets = np.asarray(stats.ep_rets).reshape(-1)
                ended = lens > 0
                for r, l in zip(rets[ended], lens[ended]):
                    rewbuffer.append(float(r))
                    lenbuffer.append(int(l))
                    if monitor is not None:
                        monitor.record(float(r), int(l))
            else:
                # learners without per-episode arrays (GAIL): fall back to
                # the per-iteration mean approximation
                mean_ret = float(stats.ep_ret_sum) / ep_count
                mean_len = float(stats.ep_len_sum) / ep_count
                for _ in range(min(ep_count, 40)):
                    rewbuffer.append(mean_ret)
                    lenbuffer.append(mean_len)
                if monitor is not None:
                    monitor.record(mean_ret, int(mean_len))
        episodes_so_far += ep_count
        timesteps_so_far += int(stats.timesteps)
        counted_so_far += int(stats.ep_len_sum_last)
        iters_so_far += 1

        if verbose:
            logger.record_tabular("optimgain", float(stats.optimgain))
            logger.record_tabular("meankl", float(stats.meankl))
            logger.record_tabular("entloss", float(stats.entloss))
            logger.record_tabular("surrgain", float(stats.surrgain))
            logger.record_tabular("entropy", float(stats.entropy))
            logger.record_tabular("ev_tdlam_before", float(stats.ev_tdlam_before))
            logger.record_tabular("EpLenMean", np.mean(lenbuffer) if lenbuffer else np.nan)
            logger.record_tabular("EpRewMean", np.mean(rewbuffer) if rewbuffer else np.nan)
            logger.record_tabular("EpThisIter", ep_count)
            logger.record_tabular("EpisodesSoFar", episodes_so_far)
            logger.record_tabular("TimestepsSoFar", timesteps_so_far)
            # the reference's TimestepsSoFar counts only last-segment
            # completed-episode steps (trpo.py:310-311) — compare learning
            # curves against this column, not TimestepsSoFar
            logger.record_tabular("RefCountedSteps", counted_so_far)
            logger.record_tabular("TimeElapsed", time.time() - tstart)
            logger.dump_tabular()

    if ckpt_dir is not None:
        checkpoint.save(os.path.join(ckpt_dir, "trpo_state"), state)
    if monitor is not None:
        monitor.close()
    return state
