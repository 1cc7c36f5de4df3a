#!/bin/sh
# Queued round-4 chip jobs — exact recipes, runnable verbatim when the hosted
# v5e chip is free.  Run ONE at a time (the tunnel serves a single process);
# wrap in per-job `timeout` caps + a global deadline as in tools/r3b_chain.sh.
#
# Context from round 3b (2026-08-19): the repo filesystem RESETS between build
# sessions, so .jax_cache starts cold — bench.py/__graft_entry__ now seed it
# from benchdata/warm_jax_cache/.  Budget ~2-4 min of cold compile per
# *training* recipe below (their executables are not in the warm cache).
set -e

# 1. Spinkick fine-tune, leg 2: resume from the 788-iter r3 checkpoint
#    (train_ckpt_spinkick_r3, fixed RSI phase obs).  Target (VERDICT r2 #1):
#    >=0.6 reward/step deterministic via tools/eval_imitation.py.
spinkick_finetune_leg2() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion spinkick \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 1700 --save-per-iter 50 \
      --pretrained-weight-path train_ckpt_spinkick_r3/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
      --override-logstd -3.0 \
      --log-dir train_logs_spinkick_r4 --checkpoint-dir train_ckpt_spinkick_r4
}

# 2. GAIL from the real walk expert dataset (VERDICT r2 #4, skipped in r3b for
#    chip time).  Target: true EpLen >= 270 with per-episode monitor rows.
gail_r4() {
    python -m deepmimic_mujoco_tpu.cli.train_gail \
      --expert-path assets/expert/walk_expert.npz --motion walk \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 \
      --obs-mode full --num-envs 64 --num-iters 800 \
      --log-dir train_logs_gail_r3 --checkpoint-dir train_ckpt_gail_r3
}

# 3. Multi-skill retrain (walk+run+spinkick) under the fixed cursor + phase
#    obs (VERDICT r2 #2).  2500 iters ~ 1.6h: run in legs across sessions via
#    --pretrained-weight-path resume if needed.
multiskill_r4() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion walk,run,spinkick \
      --clip-weights 1,1,2 \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 2500 --save-per-iter 50 \
      --log-dir train_logs_multiskill_r3 --checkpoint-dir train_ckpt_multiskill_r3
}

# 4. Deterministic evals (each needs its own ~3-6 min cold compile; give
#    generous caps or run right after a same-shape eval warmed the cache).
eval_spinkick() {
    python tools/eval_imitation.py \
      --ckpt "${1:-train_ckpt_spinkick_r4/DPEnvV3/trpo-spinkick-0/trpo_state.npz}" \
      --motion spinkick --episodes 32 \
      --hidden-sizes 1024,512 --activation relu --obs-mode full
}
eval_multiskill_r2() {
    python tools/eval_multiskill.py \
      --ckpt "train_ckpt_multiskill_r2/DPEnvV3/trpo-walk+run+spinkick-0/trpo_state.npz"
}

# 5. Batch sweep on the r3 default solver config (warm25 + bf16 + 8/8 caps):
#    re-measure the 2048/4096 design points whose r2 numbers predate the
#    ~16x A-traffic reduction (BASELINE.md "HBM-bound analysis").
sweep_r4() {
    BENCH_SWEEP=2048,4096 python bench.py
}

if [ $# -eq 0 ]; then
    echo "usage: $0 <job>   (one of: spinkick_finetune_leg2 gail_r4 multiskill_r4 eval_spinkick eval_multiskill_r2 sweep_r4)" >&2
    echo "note: round-4 runs these via tools/r4_chain.sh" >&2
    exit 2
fi
"$@"
