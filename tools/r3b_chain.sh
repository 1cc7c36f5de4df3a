#!/bin/sh
# Round-3 continuation chain: run the queued chip jobs (tools/r3_queue.sh)
# sequentially on the single hosted v5e chip, under a global deadline so the
# tunnel is free again before the driver's end-of-round bench.
#
# Lesson encoded here: the repo-local .jax_cache does NOT survive between
# rounds, so every distinct program pays a multi-minute cold compile on the
# hosted tunnel.  Job 1 is therefore bench.py itself — it warms the exact
# executable the driver's end-of-round bench will run.  Caps are sized for
# compile + useful work; jobs are ordered by VERDICT-r2 value per chip-minute.
cd /root/repo || exit 1
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-2300} ))
mkdir -p chainlog

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run <cap_seconds> <logfile> <cmd...>
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 120 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain.log
        return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain.log
}

# 1. Warm the driver-visible bench executable + fresh r3b headline number.
run 800 bench_768.log python bench.py

# 2. dp_policy PPO on the real 197-D/36-D DeepMimic surface (VERDICT r2 #5).
run 950 dp_ppo.log python -m deepmimic_mujoco_tpu.cli.train_ppo \
    --surface deepmimic --motion walk --num-envs 32 --num-iters 300 \
    --log-dir train_logs_dp_ppo --checkpoint-dir train_ckpt_dp_ppo

# 3. Non-looping 60fps clip end-to-end (clamp cursor + SUCC path, VERDICT #6).
run 650 getup.log python -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion getup_facedown \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --num-envs 64 --num-iters 100 --save-per-iter 50 \
    --log-dir train_logs_getup_r3 --checkpoint-dir train_ckpt_getup_r3

# 4. Odd-rate 16fps wrap clip end-to-end (cursor_scale~0.53, VERDICT #6).
run 650 backflip.log python -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion backflip \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --num-envs 64 --num-iters 100 --save-per-iter 50 \
    --log-dir train_logs_backflip_r3 --checkpoint-dir train_ckpt_backflip_r3

# 5. GAIL from the real walk expert dataset (VERDICT #4) — fills remaining time.
run 3600 gail.log python -m deepmimic_mujoco_tpu.cli.train_gail \
    --expert-path assets/expert/walk_expert.npz --motion walk \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 \
    --obs-mode full --num-envs 64 --num-iters 800 \
    --log-dir train_logs_gail_r3 --checkpoint-dir train_ckpt_gail_r3

echo "== CHAIN DONE $(date -u +%H:%M:%S)" >> chainlog/chain.log
