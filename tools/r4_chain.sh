#!/bin/sh
# Round-4 training chain: the queued chip jobs (tools/r4_queue.sh) in
# VERDICT-r3 priority order, sequentially on the single hosted v5e chip,
# under a global deadline so the tunnel is free before the driver's
# end-of-round bench.  Per-job caps allow the multi-minute cold compile
# each distinct program pays on the hosted tunnel (the .jax_cache is
# seeded from benchdata/warm_jax_cache but holds only bench executables).
cd /root/repo || exit 1
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-28800} ))
mkdir -p chainlog

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run <cap_seconds> <logfile> <cmd...>
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 180 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain_r4.log
        return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain_r4.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain_r4.log
}

# 1. Spinkick leg 2 (VERDICT r3 #3): resume the 788-iter r3 ckpt.
run 4800 spinkick_r4.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion spinkick \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --num-envs 64 --num-iters 1700 --save-per-iter 100 \
    --pretrained-weight-path train_ckpt_spinkick_r3/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
    --override-logstd -3.0 \
    --log-dir train_logs_spinkick_r4 --checkpoint-dir train_ckpt_spinkick_r4

# 2. Spinkick deterministic eval (32 RSI episodes).
run 800 eval_spinkick_r4.log python -u tools/eval_imitation.py \
    --ckpt train_ckpt_spinkick_r4/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
    --motion spinkick --episodes 32 \
    --hidden-sizes 1024,512 --activation relu

# 3. GAIL from the real walk expert (VERDICT r3 #4).
run 3900 gail_r4.log python -u -m deepmimic_mujoco_tpu.cli.train_gail \
    --expert-path assets/expert/walk_expert.npz --motion walk \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 \
    --obs-mode full --num-envs 64 --num-iters 800 \
    --log-dir train_logs_gail_r4 --checkpoint-dir train_ckpt_gail_r4

# 4. Multi-skill retrain walk+run+spinkick (VERDICT r3 #5).
run 6000 multiskill_r4.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion walk,run,spinkick --clip-weights 1,1,2 \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --num-envs 64 --num-iters 2000 --save-per-iter 100 \
    --log-dir train_logs_multiskill_r4 --checkpoint-dir train_ckpt_multiskill_r4

# 5. Multi-skill evals: the overdue r2 ckpt AND the fresh r4 ckpt.
run 900 eval_multiskill_r2.log python -u tools/eval_multiskill.py \
    --ckpt train_ckpt_multiskill_r2/DPEnvV3/trpo-walk+run+spinkick-0/trpo_state.npz
run 900 eval_multiskill_r4.log python -u tools/eval_multiskill.py \
    --ckpt train_ckpt_multiskill_r4/DPEnvV3/trpo-walk+run+spinkick-0/trpo_state.npz

# 6. dp_policy PPO extension (VERDICT r3 #6): resume the 71-iter walk run
#    and push the learning curve decisively.
run 3900 dp_ppo_r4.log python -u -m deepmimic_mujoco_tpu.cli.train_ppo \
    --surface deepmimic --motion walk --num-envs 32 --num-iters 400 \
    --resume train_ckpt_dp_ppo/deepmimic/ppo-walk-0/ppo_params.npz \
    --log-dir train_logs_dp_ppo_r4 --checkpoint-dir train_ckpt_dp_ppo_r4

# 7. Odd-rate non-looping leg: getup_facedown 60 fps loop=none (VERDICT r3 #7).
run 2400 getup_r4.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion getup_facedown \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --num-envs 64 --num-iters 500 --save-per-iter 100 \
    --log-dir train_logs_getup_r4 --checkpoint-dir train_ckpt_getup_r4
run 800 eval_getup_r4.log python -u tools/eval_imitation.py \
    --ckpt train_ckpt_getup_r4/DPEnvV3/trpo-getup_facedown-0/trpo_state.npz \
    --motion getup_facedown --episodes 16 \
    --hidden-sizes 1024,512 --activation relu

# 8. 15-clip imitation coverage suite (VERDICT r3 #8) — fills remaining time.
run 8000 imit15.log python -u tools/imitation15_suite.py --iters 150 \
    --episodes 16 --out benchdata/imitation15_r4.json

# 9. Re-warm the driver-visible bench executable on whatever defaults are
#    current, so the end-of-round bench is warm.
run 1500 bench_final_warm.log python -u bench.py
echo "== CHAIN DONE at $(date -u +%H:%M:%S)" >> chainlog/chain_r4.log
