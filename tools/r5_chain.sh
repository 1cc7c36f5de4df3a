#!/bin/sh
# Round-5 chip chain (run after the 15-lane vmapped trainer exits ~11:21):
#   1. eval the 15-lane checkpoint -> benchdata/imitation15_r5.json
#   2. unroll A/B bench (VERDICT r4 #4) -- rolled vs unrolled micro-loops
#   3. 5-headliner continuation (walk,run,spinkick,backflip,getup_facedown)
#      at 160 envs/lane, lanes resumed from the 15-lane checkpoint
#   4. eval the 5-lane run -> benchdata/imitation5_r5.json
#   5. re-warm the bench compile cache + final driver-visible bench
# Legs are also runnable one-at-a-time by hand (SKIP via env, e.g. SKIP2=1).
cd /root/repo || exit 1
mkdir -p chainlog benchdata
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-27000} ))

left() { echo $(( DEADLINE - $(date +%s) )); }
run() {  # run <cap_seconds> <logfile> <cmd...>
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 180 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain_r5.log; return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain_r5.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain_r5.log
}

# 1. 15-lane eval (the trainer's own eval is skipped when the 4h timeout
#    kills it; --eval-only recovers it from the periodic checkpoint)
[ -z "$SKIP1" ] && run 2400 imit15_r5_eval.log \
    python -u tools/imitation15_vmapped.py --eval-only \
    --resume train_ckpt_imit15_r5/imit15_state.npz \
    --eval-episodes 32 --eval-horizon 300 \
    --out benchdata/imitation15_r5.json

# 2. unroll A/B (fresh compiles -- keep iters small)
if [ -z "$SKIP2" ]; then
    run 2000 bench_unrolled.log env BENCH_SWEEP=0 BENCH_ITERS=5 \
        python -u bench.py
    run 2000 bench_rolled.log env BENCH_SWEEP=0 BENCH_ITERS=5 \
        DMTPU_UNROLL_SOLVER=1 DMTPU_UNROLL_NS=1 DMTPU_UNROLL_STAGES=1 \
        python -u bench.py
    run 2000 bench_unroll_sub.log env BENCH_SWEEP=0 BENCH_ITERS=5 \
        DMTPU_UNROLL_SUBSTEPS=0 python -u bench.py
    run 2000 bench_unroll_hor4.log env BENCH_SWEEP=0 BENCH_ITERS=5 \
        DMTPU_UNROLL_SUBSTEPS=0 DMTPU_UNROLL_HORIZON=4 python -u bench.py
fi

# 3. headliner continuation (5 lanes x 160 envs, params resumed)
[ -z "$SKIP3" ] && run 11000 imit5_r5.log \
    python -u tools/imitation15_vmapped.py \
    --clips walk,run,spinkick,backflip,getup_facedown \
    --envs 160 --iters 2600 --horizon 256 --g-step 3 \
    --save-per-iter 100 --log-every 20 \
    --resume train_ckpt_imit15_r5/imit15_state.npz --resume-lanes \
    --eval-episodes 32 --eval-horizon 300 \
    --out benchdata/imitation5_r5.json \
    --ckpt-root train_ckpt_imit5_r5 --log-root train_logs_imit5_r5

# 4. eval (only needed if leg 3 was timeout-killed before its own eval)
[ -z "$SKIP4" ] && [ ! -f benchdata/imitation5_r5.json ] && \
    run 2400 imit5_r5_eval.log \
    python -u tools/imitation15_vmapped.py --eval-only \
    --clips walk,run,spinkick,backflip,getup_facedown --envs 160 \
    --resume train_ckpt_imit5_r5/imit15_state.npz \
    --eval-episodes 32 --eval-horizon 300 \
    --out benchdata/imitation5_r5.json \
    --ckpt-root train_ckpt_imit5_r5 --log-root train_logs_imit5_r5

# 5. dp_policy PPO extension (VERDICT r4 #7): continue the r4b run toward
#    a decisive Test_Return curve at the spec's pinned 2.5e-6 stepsize
[ -z "$SKIP5" ] && run 5400 dp_ppo_r5.log \
    python -u -m deepmimic_mujoco_tpu.cli.train_ppo \
    --surface deepmimic --motion walk --num-envs 512 --num-iters 700 \
    --resume train_ckpt_dp_ppo_r4b/deepmimic/ppo-walk-0/ppo_params.npz \
    --log-dir train_logs_dp_ppo_r5 --checkpoint-dir train_ckpt_dp_ppo_r5

# 6. final driver-visible bench (full sweep, warm cache)
[ -z "$SKIP6" ] && run 2400 bench_final_r5.log python -u bench.py
echo "== CHAIN5 DONE at $(date -u +%H:%M:%S)" >> chainlog/chain_r5.log
