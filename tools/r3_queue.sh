#!/bin/sh
# Queued round-3 chip jobs — exact recipes, runnable verbatim when the
# hosted v5e chip is free.  Each job writes its own args.json into the log
# dir (cli/train_trpo does this automatically).  Run ONE at a time: the
# tunnel serves a single process.
#
# Status legend is maintained in BASELINE.md ("Status ... round 3").
set -e

# 1. Spinkick fine-tune from the r2 polish checkpoint under the FIXED RSI
#    phase observation (dp_env_v3.py:370 fix, commit 4bb5869).  Launched
#    2026-08-18 12:23 UTC; logs in train_logs_spinkick_r3/.
spinkick_finetune() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion spinkick \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 2500 --save-per-iter 50 \
      --pretrained-weight-path train_ckpt_spinkick_polish/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
      --override-logstd -3.0 \
      --log-dir train_logs_spinkick_r3 --checkpoint-dir train_ckpt_spinkick_r3
}

# 2. Multi-skill retrain (walk+run+spinkick, one policy) under the fixed
#    cursor + fixed phase obs; clip_weights oversample spinkick (hardest).
multiskill_r3() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion walk,run,spinkick \
      --clip-weights 1,1,2 \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 2500 --save-per-iter 50 \
      --log-dir train_logs_multiskill_r3 --checkpoint-dir train_ckpt_multiskill_r3
}

# 3. Odd-rate / non-looping clip paths end-to-end (VERDICT r2 #6): backflip
#    (16 fps, cursor_scale~0.53, wrap) and getup_facedown (60 fps,
#    loop=none -> clamp cursor + SUCC termination).  Short runs — the point
#    is the paths running hot in real training, not a polished policy.
backflip_short() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion backflip \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 300 --save-per-iter 100 \
      --log-dir train_logs_backflip_r3 --checkpoint-dir train_ckpt_backflip_r3
}
getup_short() {
    python -m deepmimic_mujoco_tpu.cli.train_trpo --motion getup_facedown \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 --gamma 0.95 --lam 0.95 \
      --fixed-logstd -3.0 --hidden-sizes 1024,512 --activation relu \
      --num-envs 64 --num-iters 300 --save-per-iter 100 \
      --log-dir train_logs_getup_r3 --checkpoint-dir train_ckpt_getup_r3
}

# 4. GAIL from the real walk expert dataset (assets/expert/walk_expert.npz,
#    sampled from the bundled walk_r2 policy) to reference-scale results
#    (target: true EpLen >= 270).
gail_r3() {
    python -m deepmimic_mujoco_tpu.cli.train_gail \
      --expert-path assets/expert/walk_expert.npz --motion walk \
      --reward-mode imitation_dm --control-mode pd_residual --reset-mode rsi \
      --n-substeps 2 --max-episode-steps 300 \
      --obs-mode full --num-envs 64 --num-iters 800 \
      --log-dir train_logs_gail_r3 --checkpoint-dir train_ckpt_gail_r3
}

# 5. dp_policy PPO on the real 197-D record_state / 36-D PD surface —
#    the committed learning artifact VERDICT r2 #5 asks for.
dp_ppo_r3() {
    python -m deepmimic_mujoco_tpu.cli.train_ppo --surface deepmimic \
      --motion walk --num-envs 32 --num-iters 300 \
      --log-dir train_logs_dp_ppo --checkpoint-dir train_ckpt_dp_ppo
}

# 6. Deterministic evals once the runs above finish.
eval_spinkick() {
    python tools/eval_imitation.py \
      --ckpt train_ckpt_spinkick_r3/DPEnvV3/trpo-spinkick-0/trpo_state.npz \
      --motion spinkick --episodes 32 \
      --hidden-sizes 1024,512 --activation relu --obs-mode full
}

"$@"
