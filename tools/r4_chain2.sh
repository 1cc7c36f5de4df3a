#!/bin/sh
# Round-4 chain, part 2: the jobs part 1 (tools/r4_chain.sh) did not reach
# before the session driving it died — getup_facedown (VERDICT r3 #7), the
# 15-clip imitation coverage suite (#8), the dp_policy PPO extension finish
# (#6) — sequentially on the single hosted v5e chip under a global deadline.
cd /root/repo || exit 1
DEADLINE=$(( $(date +%s) + ${CHAIN_BUDGET:-14400} ))
mkdir -p chainlog

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run <cap_seconds> <logfile> <cmd...>
    cap=$1; shift; lf=$1; shift
    t=$(left)
    if [ "$t" -le 180 ]; then
        echo "== SKIP (deadline): $*" >> chainlog/chain_r4b.log
        return 0
    fi
    [ "$t" -lt "$cap" ] && cap=$t
    echo "== $(date -u +%H:%M:%S) cap=${cap}s: $*" >> chainlog/chain_r4b.log
    timeout -k 30 "$cap" "$@" > "chainlog/$lf" 2>&1
    echo "== rc=$? at $(date -u +%H:%M:%S)" >> chainlog/chain_r4b.log
}

# 1. Odd-rate non-looping leg: getup_facedown 60 fps loop=none (VERDICT r3 #7).
#    Same program shapes as the part-1 TRPO jobs -> warm compile cache.
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

# 2. 15-clip imitation coverage suite (VERDICT r3 #8).
run 9000 imit15.log python -u tools/imitation15_suite.py --iters 150 \
    --episodes 16 --out benchdata/imitation15_r4.json

# 3. dp_policy PPO decisive-learning run (VERDICT r3 #6): the resumed
#    32-env runs learn (Test_Return 10.2 -> ~12.7 over 369 iters) but at
#    ~1k samples/s the reference spec's tens-of-millions-of-samples budget
#    (ct_agent_humanoid_ppo.txt) is out of reach; scale the env batch the
#    same way the reference scales MPI workers.  ActorStepsize stays the
#    spec's 2.5e-6.
run 5400 dp_ppo_r4b.log python -u -m deepmimic_mujoco_tpu.cli.train_ppo \
    --surface deepmimic --motion walk --num-envs 512 --num-iters 500 \
    --resume train_ckpt_dp_ppo_r4/deepmimic/ppo-walk-0/ppo_params.npz \
    --log-dir train_logs_dp_ppo_r4b --checkpoint-dir train_ckpt_dp_ppo_r4b

echo "== CHAIN2 DONE at $(date -u +%H:%M:%S)" >> chainlog/chain_r4b.log
