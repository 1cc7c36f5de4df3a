#!/bin/sh
# Round-4 chain, part 3: retrain the skills that were capped by the mocap
# velocity/branch defects fixed in round 4 (MocapClip.qpos_cont/qvel_fd,
# wrapped PD error, per-skill fall-contact lists), then the 15-clip
# coverage suite on the fixed envs.  Sequential on the single v5e chip.
cd /root/repo || exit 1
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-25200} ))
mkdir -p chainlog

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run <cap_seconds> <logfile> <cmd...>
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 180 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain_r4c.log
        return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain_r4c.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain_r4c.log
}

# 1. Spinkick from scratch on the fixed clip track (one-step PD ceiling is
#    now 0.82 vs 0.48 — VERDICT r3 #3 target >=0.6/step is inside it).
run 6600 spinkick_r4c.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion spinkick \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --joint-limits mocap \
    --num-envs 128 --num-iters 2200 --save-per-iter 200 \
    --log-dir train_logs_spinkick_r4c --checkpoint-dir train_ckpt_spinkick_r4c
run 900 eval_spinkick_r4c.log python -u tools/eval_imitation.py \
    --ckpt train_ckpt_spinkick_r4c/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
    --motion spinkick --episodes 32 --joint-limits mocap \
    --hidden-sizes 1024,512 --activation relu

# 2. getup_facedown rerun — the fall-contact list is now reference-correct
#    (empty: the clip STARTS on the floor), so episodes can run the clip out.
run 2400 getup_r4c.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion getup_facedown \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --joint-limits mocap \
    --num-envs 64 --num-iters 500 --save-per-iter 100 \
    --log-dir train_logs_getup_r4c --checkpoint-dir train_ckpt_getup_r4c
run 900 eval_getup_r4c.log python -u tools/eval_imitation.py \
    --ckpt train_ckpt_getup_r4c/DPEnvV3/trpo-getup_facedown-0/trpo_state.npz \
    --motion getup_facedown --episodes 16 --joint-limits mocap \
    --hidden-sizes 1024,512 --activation relu

# 3. 15-clip imitation coverage suite (VERDICT r3 #8) on the fixed envs.
run 14000 imit15.log python -u tools/imitation15_suite.py --iters 150 \
    --episodes 16 --out benchdata/imitation15_r4.json

# 4. Multi-skill retrain on the fixed envs (VERDICT r3 #5).
run 6000 multiskill_r4c.log python -u -m deepmimic_mujoco_tpu.cli.train_trpo \
    --motion walk,run,spinkick --clip-weights 1,1,2 \
    --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
    --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
    --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
    --joint-limits mocap \
    --num-envs 64 --num-iters 2000 --save-per-iter 200 \
    --log-dir train_logs_multiskill_r4c --checkpoint-dir train_ckpt_multiskill_r4c
run 900 eval_multiskill_r4c.log python -u tools/eval_multiskill.py --joint-limits mocap \
    --ckpt train_ckpt_multiskill_r4c/DPEnvV3/trpo-walk+run+spinkick-0/trpo_state.npz

# 5. Re-warm the driver-visible bench executable.
run 1500 bench_final_warm.log python -u bench.py
echo "== CHAIN3 DONE at $(date -u +%H:%M:%S)" >> chainlog/chain_r4c.log
