#!/bin/sh
# Round-5 chip chain, part 2 (runs after the 5-headliner vmapped leg):
#   1. on-chip profiler trace of the unrolled-default iteration (floor
#      analysis evidence for BASELINE.md)
#   2. 15-lane resume leg: continue train_ckpt_imit15_r5 another 600 iters
#      on all 15 skills, then its inline eval -> benchdata/imitation15_r5.json
#   3. dp_policy PPO extension (VERDICT r4 #7)
#   4. full default-sweep bench (pre-caches the 2048/4096 compiles the
#      driver's BENCH_r05 run will reuse)
cd /root/repo || exit 1
mkdir -p chainlog benchdata
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-18000} ))

left() { echo $(( DEADLINE - $(date +%s) )); }
run() {
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 180 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain_r5b.log; return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain_r5b.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain_r5b.log
}

[ -z "$SKIP1" ] && run 1200 trace_r5.log \
    python -u tools/profile_trace.py --num-envs 768 --out /tmp/dmtpu_trace_r5

[ -z "$SKIP2" ] && STALL_S=600 RESUME_CLIPS="" run 8400 imit15_r5b.log \
    tools/babysit_vmapped.sh 8200 train_logs_imit15_r5b train_ckpt_imit15_r5b \
    imit15_r5b_inner.log \
    --envs 64 --iters 600 --horizon 256 --g-step 3 \
    --save-per-iter 100 --log-every 20 \
    --resume train_ckpt_imit15_r5/imit15_state.npz \
    --eval-episodes 32 --eval-horizon 300 \
    --out benchdata/imitation15_r5.json

[ -z "$SKIP3" ] && run 4200 dp_ppo_r5.log \
    python -u -m deepmimic_mujoco_tpu.cli.train_ppo \
    --surface deepmimic --motion walk --num-envs 512 --num-iters 700 \
    --resume train_ckpt_dp_ppo_r4b/deepmimic/ppo-walk-0/ppo_params.npz \
    --log-dir train_logs_dp_ppo_r5 --checkpoint-dir train_ckpt_dp_ppo_r5

[ -z "$SKIP4" ] && run 4200 bench_final_r5.log python -u bench.py
echo "== CHAIN5B DONE at $(date -u +%H:%M:%S)" >> chainlog/chain_r5b.log
