#!/usr/bin/env python3
"""TRPO training / evaluation CLI — the reference's ``trpo.py __main__``
(/root/reference/src/trpo.py:438-521) with the same hyperparameter surface.

Examples:
  python -m deepmimic_mujoco_tpu.cli.train_trpo --task train \
      --motion walk --num-timesteps 1000000
  python -m deepmimic_mujoco_tpu.cli.train_trpo --task evaluate \
      --load-model-path ckpt/trpo_state.npz
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env-id", default="DPEnvV3")
    p.add_argument("--motion", default="walk", help="mocap clip (Config.motion)")
    p.add_argument("--reward-mode", default="alive",
                   choices=["alive", "mocap", "imitation", "imitation_dm"],
                   help="imitation = the port's L1 formulas; imitation_dm = "
                        "the ORIGINAL DeepMimic reward (squared errors, "
                        "heading-relative end effectors, com velocity)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--task", default="train", choices=["train", "evaluate", "sample"])
    p.add_argument("--algo", default="trpo", choices=["trpo", "ppo"],
                   help="trust-region (reference) or vectorized clipped-PPO")
    # PPO-only knobs (algos/ppo.py)
    p.add_argument("--ppo-clip", type=float, default=0.2)
    p.add_argument("--ppo-epochs", type=int, default=4)
    p.add_argument("--ppo-minibatches", type=int, default=8)
    p.add_argument("--ppo-lr", type=float, default=3e-4)
    p.add_argument("--ppo-ent-coef", type=float, default=0.0)
    p.add_argument("--ppo-lr-decay", type=float, default=1.0)
    # TRPO hyperparams (reference trpo.py:507-515, 338-354)
    p.add_argument("--g-step", type=int, default=3)
    p.add_argument("--policy-entcoeff", type=float, default=0)
    p.add_argument("--num-timesteps", type=int, default=1_000_000)
    p.add_argument("--timesteps-per-batch", type=int, default=256)
    p.add_argument("--num-envs", type=int, default=8,
                   help="replaces mpirun -np N (train_mpi.sh)")
    p.add_argument("--max-kl", type=float, default=0.01)
    p.add_argument("--cg-iters", type=int, default=10)
    p.add_argument("--cg-damping", type=float, default=0.1)
    p.add_argument("--vf-iters", type=int, default=3)
    p.add_argument("--vf-stepsize", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.995)
    p.add_argument("--lam", type=float, default=0.97)
    p.add_argument("--hid-size", type=int, default=100)
    p.add_argument("--num-hid-layers", type=int, default=2)
    p.add_argument("--hidden-sizes", default=None,
                   help="comma list overriding hid-size, e.g. 1024,512 "
                        "(the original DeepMimic net)")
    p.add_argument("--activation", default="tanh", choices=["tanh", "relu"])
    p.add_argument("--obs-mode", default=None, choices=["legacy", "full"],
                   help="legacy = reference 56-D qpos/qvel obs; full = adds "
                        "root height/orientation/velocity (default: full "
                        "for imitation reward modes)")
    p.add_argument("--fixed-logstd", type=float, default=None,
                   help="freeze exploration noise at this logstd "
                        "(DeepMimic-style fixed noise, e.g. -1.6 ~ std 0.2)")
    p.add_argument("--override-logstd", type=float, default=None,
                   help="set the logstd AFTER loading --pretrained-weight-"
                        "path (noise-annealing polish phases; the "
                        "checkpointed value wins otherwise)")
    # infra
    p.add_argument("--save-per-iter", type=int, default=100)
    p.add_argument("--checkpoint-dir", default="checkpoint_tmp")
    p.add_argument("--log-dir", default="log_tmp")
    p.add_argument("--load-model-path", default=None)
    p.add_argument("--pretrained-weight-path", default=None)
    p.add_argument("--num-iters", type=int, default=0,
                   help="stop after N iterations instead of timesteps")
    p.add_argument("--eval-episodes", type=int, default=100)
    p.add_argument("--eval-horizon", type=int, default=1024,
                   help="max steps per evaluated episode (reference runner "
                        "horizon, trpo.py:418); shrink to the env's episode "
                        "cap to cut compile/runtime")
    p.add_argument("--sample-save-path", default=None)
    p.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    p.add_argument("--joint-limits", default="xml", choices=["xml", "mocap"],
                   help="hinge limit ranges: 'xml' = reference-XML parity; "
                        "'mocap' = widened to the union of the bundled "
                        "clips' poses (the XML ranges exclude the acrobatic "
                        "clips' own poses — see physics.humanoid."
                        "mocap_hinge_range)")
    p.add_argument("--warm-iterations", type=int, default=-1,
                   help=">=0 sets PhysicsModel.warm_iterations: constraint "
                        "solves warm-start across integrator stages at this "
                        "reduced budget (0 disables; -1 keeps the model "
                        "default)")
    p.add_argument("--dynamics", default="jax", choices=["jax", "mujoco"],
                   help="physics backend: jitted JAX engine, or real MuJoCo "
                        "behind a host callback (golden A/B runs, CPU only)")
    # imitation-training extensions (the capability the reference left
    # commented out at dp_env_v3.py:118-128)
    p.add_argument("--control-mode", default="torque",
                   choices=["torque", "pd", "pd_residual"],
                   help="pd = DeepMimic-proper joint-PD target control; "
                        "pd_residual = PD targets as offsets from the clip "
                        "pose (zero action tracks the reference)")
    p.add_argument("--reset-mode", default="noise", choices=["noise", "rsi"],
                   help="post-done reset; rsi = random mocap frame")
    p.add_argument("--n-substeps", type=int, default=1,
                   help="physics substeps per control step (2 -> 30 Hz "
                        "control, matching the clip rate)")
    p.add_argument("--max-episode-steps", type=int, default=0)
    p.add_argument("--termination", default=None,
                   choices=["com", "fall_contact"],
                   help="episode termination: com = reference CoM-height "
                        "bounds (standup rule); fall_contact = original "
                        "DeepMimic fall-contact rule (default for "
                        "imitation rewards)")
    p.add_argument("--clip-weights", default=None,
                   help="multi-clip only: comma list of RSI sampling "
                        "weights per clip, e.g. 1,1,2 to up-weight a hard "
                        "skill")
    p.add_argument("--eval-reset", default="rsi", choices=["rsi", "noise"],
                   help="episode starts for evaluate/sample: rsi = random "
                        "mocap frame (reference runner semantics), noise = "
                        "the training distribution")
    return p


def task_name(args) -> str:
    """Reference get_task_short_name (trpo.py:331-336)."""
    motion = args.motion.replace(",", "+")
    return f"{args.env_id}/{args.algo}-{motion}-{args.seed}"


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from deepmimic_mujoco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from deepmimic_mujoco_tpu.algos.runner import evaluate
    from deepmimic_mujoco_tpu.algos.train_loop import train
    from deepmimic_mujoco_tpu.algos.trpo import TRPO, TRPOConfig
    from deepmimic_mujoco_tpu.envs import DPEnvV1, DPEnvV2, DPEnvV3
    from deepmimic_mujoco_tpu.io_utils import checkpoint
    from deepmimic_mujoco_tpu.models import MlpPolicy

    model = None
    if args.warm_iterations >= 0:
        import dataclasses

        from deepmimic_mujoco_tpu.physics import build_humanoid

        model = dataclasses.replace(build_humanoid(),
                                    warm_iterations=args.warm_iterations)
    if args.joint_limits == "mocap":
        # widen hinge ranges to cover the mocap poses (the reference XML's
        # ranges exclude its own acrobatic clips — physics/humanoid.py
        # mocap_hinge_range)
        from deepmimic_mujoco_tpu.physics.humanoid import mocap_hinge_range

        model = mocap_hinge_range(model)

    if "," in args.motion:
        # multi-skill imitation: one policy over several clips.  The env only
        # supports PD control + imitation rewards on the JAX backend — warn
        # instead of silently dropping explicit user flags.
        import warnings

        from deepmimic_mujoco_tpu.envs import DPEnvV3Multi

        assert args.env_id == "DPEnvV3", "multi-clip requires DPEnvV3"
        if args.control_mode == "torque":
            warnings.warn("multi-clip training requires PD control: "
                          "--control-mode torque replaced by pd_residual")
        if args.reward_mode in ("alive", "mocap"):
            if args.reward_mode != "alive":  # non-default ⇒ explicit
                warnings.warn(f"--reward-mode {args.reward_mode} is not an "
                              "imitation mode; multi-clip uses imitation_dm")
            reward_mode = "imitation_dm"
        else:
            reward_mode = args.reward_mode
        if args.dynamics != "jax":
            warnings.warn("multi-clip supports the JAX backend only; "
                          f"--dynamics {args.dynamics} ignored")
        if 0 < args.n_substeps < 2:
            warnings.warn("multi-clip requires >=2 substeps (30 Hz control); "
                          f"--n-substeps {args.n_substeps} raised to 2")
        env = DPEnvV3Multi(
            clips=tuple(args.motion.split(",")), model=model,
            control_mode=(args.control_mode if args.control_mode != "torque"
                          else "pd_residual"),
            reward_mode=reward_mode,
            n_substeps=max(args.n_substeps, 2),
            max_episode_steps=args.max_episode_steps or 300,
            obs_mode=args.obs_mode or "full",
            termination=args.termination or "fall_contact",
            clip_weights=(tuple(float(w) for w in
                                args.clip_weights.split(","))
                          if args.clip_weights else None),
        )
    else:
        env_cls = {"DPEnvV1": DPEnvV1, "DPEnvV2": DPEnvV2,
                   "DPEnvV3": DPEnvV3}[args.env_id]
        env_kwargs = {"clip": args.motion}
        if model is not None:
            assert args.env_id == "DPEnvV3", \
                "--warm-iterations requires DPEnvV3"
            env_kwargs["model"] = model
        if args.env_id == "DPEnvV3":
            env_kwargs.update(
                reward_mode=args.reward_mode, dynamics=args.dynamics,
                control_mode=args.control_mode, n_substeps=args.n_substeps,
                max_episode_steps=args.max_episode_steps,
                obs_mode=args.obs_mode, termination=args.termination)
        env = env_cls(**env_kwargs)

    hidden_sizes = (tuple(int(h) for h in args.hidden_sizes.split(","))
                    if args.hidden_sizes else None)
    policy = MlpPolicy(
        ob_dim=env.observation_size, ac_dim=env.action_size,
        hid_size=args.hid_size, num_hid_layers=args.num_hid_layers,
        fixed_logstd=args.fixed_logstd,
        hidden_sizes=hidden_sizes, activation=args.activation,
    )
    if args.algo == "ppo":
        from deepmimic_mujoco_tpu.algos.ppo import PPO, PPOConfig

        cfg = PPOConfig(
            horizon=args.timesteps_per_batch, num_envs=args.num_envs,
            gamma=args.gamma, lam=args.lam, clip_ratio=args.ppo_clip,
            epochs=args.ppo_epochs, minibatches=args.ppo_minibatches,
            lr=args.ppo_lr, ent_coef=args.ppo_ent_coef,
            reset_mode=args.reset_mode, lr_decay=args.ppo_lr_decay,
        )
        learner = PPO(env, policy, cfg)
    else:
        cfg = TRPOConfig(
            horizon=args.timesteps_per_batch, num_envs=args.num_envs,
            g_step=args.g_step, gamma=args.gamma, lam=args.lam,
            max_kl=args.max_kl, cg_iters=args.cg_iters,
            cg_damping=args.cg_damping,
            vf_iters=args.vf_iters, vf_stepsize=args.vf_stepsize,
            entcoeff=args.policy_entcoeff, reset_mode=args.reset_mode,
        )
        learner = TRPO(env, policy, cfg)
    name = task_name(args)

    if args.task == "train":
        # record the exact recipe next to the logs (the reference loses it;
        # round-2 runs had to be reconstructed from commit messages)
        log_dir = os.path.join(args.log_dir, name)
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "args.json"), "w") as f:
            json.dump(vars(args), f, indent=1, sort_keys=True)
        train(
            learner, seed=args.seed,
            max_timesteps=args.num_timesteps if not args.num_iters else 0,
            max_iters=args.num_iters,
            ckpt_dir=os.path.join(args.checkpoint_dir, name),
            log_dir=log_dir,
            save_per_iter=args.save_per_iter,
            resume_from=args.pretrained_weight_path,
            override_logstd=args.override_logstd,
        )
    else:
        state = learner.init(jax.random.PRNGKey(args.seed))
        if args.load_model_path:
            state = checkpoint.load(args.load_model_path, state)
        avg_len, avg_ret = evaluate(
            env, policy, state.params, jax.random.PRNGKey(args.seed),
            n_episodes=args.eval_episodes, horizon=args.eval_horizon,
            stochastic=(args.task == "sample"),
            save_path=args.sample_save_path,
            reset_mode=args.eval_reset,
        )
        print(f"Average length: {avg_len:.1f}")
        print(f"Average return: {avg_ret:.1f}")


if __name__ == "__main__":
    main()
