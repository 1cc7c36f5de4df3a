"""RL agent driver — the original stack's ``RLAgent`` act-and-train FSM
(reference: /root/reference/src/dp_policy_testing/learning/rl_agent.py)
wired to our functional envs.

Faithful pieces (the original training semantics, which the reference ships
but cannot drive without the C++ DeepMimicCore):
* TRAIN/TEST mode switching (rl_agent.py:370-412)
* per-action ε-greedy exploration coin flip at the annealed rate; exploring
  actions carry EXP_ACTION_FLAG (pg_agent.py:193-209)
* paths accumulate into the replay buffer as they END, n+1 records each
  (rl_agent._update_new_action/_end_path/_store_path, rl_agent.py:332-356)
* training fires when the buffer holds > BatchSize samples and at least one
  exploration sample (_valid_train_step, ppo_agent.py:266-271) — the
  original checks this every ``UpdatePeriod`` seconds of sim time
  (rl_agent.py:123-136); here the check runs every rollout chunk (the chunk
  length is the sim-time quantum)
* the train step consumes the WHOLE buffer then clears it
  (ppo_agent._train_step, ppo_agent.py:165-262) — the 500k ring is
  headroom, PPO is on-policy
* exploration-parameter annealing by total sample count
  (rl_agent.py:358-362)
* distributed episode accounting: the vectorized env batch is the worker
  pool; batched test episodes replace the MPI-reduced counts
  (rl_agent.py:521-584)

The rollout runs as a jitted scan over the vectorized env; path assembly and
the ring buffer live on the host (as in the original), training is one
jitted ``PPOAgent.train_on_batch``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.dp_policy.path import Path, Terminate
from deepmimic_mujoco_tpu.dp_policy.ppo_agent import PPOAgent
from deepmimic_mujoco_tpu.dp_policy.replay_buffer import ReplayBuffer


class Mode:
    TRAIN = 0
    TEST = 1
    TRAIN_END = 2


class RLAgentDriver:
    def __init__(self, env, agent: PPOAgent, num_envs: int = 32,
                 seed: int = 0, chunk: int = 32):
        self.env = env
        self.agent = agent
        self.num_envs = num_envs
        self.chunk = chunk
        self.mode = Mode.TRAIN
        self._key = jax.random.PRNGKey(seed)
        self.replay_buffer = ReplayBuffer(
            int(agent.spec.get("ReplayBufferSize", 500000)))
        self._pending = [Path() for _ in range(num_envs)]
        self._path_returns: list[float] = []
        self.iter = 0
        # pad cap for the jitted train step, sized ONCE from the worst case
        # so the (n_mb, cap) jit signature never changes: training fires on
        # the first chunk that pushes the buffer past BatchSize, and one
        # chunk adds at most num_envs·chunk step records plus one end record
        # per done (≤ one per step) — cap growth would retrace the whole
        # multi-epoch training graph (minutes-scale on the hosted tunnel)
        cap = agent.batch_size + 2 * num_envs * chunk + 64
        self._train_cap = int(-(-cap // 256) * 256)
        # minibatch count is static too: minibatches sample with replacement
        # from probability vectors, so the count need not track n_valid
        self._n_mb = max(1, -(-agent.batch_size // agent.mini_batch_size))

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _rollout(self, params, env_state, key):
        """One chunk of vectorized acting: per-env, per-step ε-greedy coin
        flips (pg_agent._decide_action) with auto-reset on done.  Outputs
        pre-reset next observations so path ends keep their terminal
        state."""
        B = self.num_envs
        cap = getattr(self.env, "max_episode_steps", 0)
        wraps = getattr(self.env, "clip_wraps", True)
        clip_len = getattr(self.env, "clip_len", 0)

        def step_fn(carry, _):
            env_state, key = carry
            key, k_act, k_coin = jax.random.split(key, 3)
            ob = env_state.obs
            rate, _ = self.agent.exp_params_at(params["sample_count"])
            exploring = jax.random.uniform(k_coin, (B,)) < rate
            ks = jax.random.split(k_act, B)
            a, logp = jax.vmap(
                lambda k, o, e: self.agent.decide_action(params, k, o, e)
            )(ks, ob, exploring)
            nxt = jax.vmap(self.env.step)(env_state, a)
            done = nxt.done

            cap_done = (jnp.zeros(B, bool) if not cap
                        else nxt.step_count >= cap)
            if wraps or not clip_len:
                succ_done = jnp.zeros(B, bool)
            elif hasattr(self.env, "_clip_over"):
                # success must use the env's own SCALED cursor predicate:
                # non-looping 60 fps clips finish at raw mocap_idx ≈ (T-1)/2,
                # so a raw-counter comparison would label a completed motion
                # Terminate.FAIL and bootstrap its value with val_min
                succ_done = jax.vmap(self.env._clip_over)(
                    nxt.mocap_idx, nxt.init_idx)
            else:
                succ_done = nxt.mocap_idx >= clip_len - 1
            term = jnp.where(
                done,
                jnp.where(succ_done, Terminate.SUCC,
                          jnp.where(cap_done, Terminate.NULL,
                                    Terminate.FAIL)),
                Terminate.NULL).astype(jnp.int8)

            # auto-reset finished envs: noise reset where the env has one
            # (DPEnvV3 standup), RSI otherwise (DeepMimic surface)
            k_resets = jax.vmap(lambda k: jax.random.split(k)[0])(nxt.key)
            reset_fn = getattr(self.env, "reset_init", self.env.reset)
            fresh = jax.vmap(reset_fn)(k_resets)

            def pick(new, old):
                m = done.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            env_state2 = jax.tree.map(pick, fresh, nxt)
            out = (ob, a, logp, nxt.reward, done, exploring, term, nxt.obs)
            return (env_state2, key), out

        (env_state, key), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=self.chunk)
        return env_state, traj

    # ------------------------------------------------------------------
    def _absorb_chunk(self, traj):
        """Append a rolled chunk to the per-env pending paths; store
        completed paths into the ring (rl_agent._update_new_action /
        _end_path / _store_path)."""
        obs, acs, logps, rews, dones, exps, terms, obs_next = (
            np.asarray(t) for t in traj)
        T, B = rews.shape
        flag = PPOAgent.EXP_ACTION_FLAG
        for t in range(T):
            for b in np.arange(B):
                p = self._pending[b]
                p.states.append(obs[t, b])
                p.actions.append(acs[t, b])
                p.logps.append(float(logps[t, b]))
                p.rewards.append(float(rews[t, b]))
                p.flags.append(flag if exps[t, b] else 0)
                if dones[t, b]:
                    p.states.append(obs_next[t, b])   # terminal record
                    p.terminate = int(terms[t, b])
                    self._path_returns.append(p.calc_return())
                    self.replay_buffer.store(p)
                    self._pending[b] = Path()

    def _valid_train_step(self) -> bool:
        """ppo_agent._valid_train_step (ppo_agent.py:266-271)."""
        return (self.replay_buffer.get_current_size() > self.agent.batch_size
                and self.replay_buffer.count_filtered(
                    PPOAgent.EXP_ACTION_FLAG) > 0)

    def _train(self, params):
        """ppo_agent._train_step over the whole buffer, then clear."""
        buf = self.replay_buffer
        n = buf.get_current_size()
        cap = self._train_cap
        if n > cap:   # unreachable by construction; never truncate silently
            raise RuntimeError(
                f"replay buffer holds {n} records > static pad cap {cap}")

        def pad(a, fill=0.0):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        states = pad(buf.get_all("states"))
        actions = pad(buf.get_all("actions"))
        logps = pad(buf.get_all("logps"))
        rewards = pad(buf.get_all("rewards"))
        is_end = pad(buf.end_mask(), True)
        is_fail = pad(buf.fail_mask(), False)
        is_succ = pad(buf.succ_mask(), False)
        is_exp = pad(buf.flag_mask(PPOAgent.EXP_ACTION_FLAG), False)
        valid = np.zeros(cap, bool)
        valid[:n] = True

        n_mb = self._n_mb

        self._key, k = jax.random.split(self._key)
        params, metrics = self.agent.train_on_batch(
            params, k,
            jnp.asarray(states), jnp.asarray(actions), jnp.asarray(logps),
            jnp.asarray(rewards), jnp.asarray(is_end), jnp.asarray(is_fail),
            jnp.asarray(is_succ), jnp.asarray(is_exp), n_mb,
            valid=jnp.asarray(valid))
        buf.clear()
        self.iter += 1
        return params, metrics

    # ------------------------------------------------------------------
    def train_iteration(self, params, env_state):
        """Roll chunks until one train update fires (the original's
        ``update(timestep)`` loop, rl_agent.py:123-136), then train on the
        buffer and clear it."""
        while not self._valid_train_step():
            self._key, k = jax.random.split(self._key)
            env_state, traj = self._rollout(params, env_state, k)
            self._absorb_chunk(traj)
        params, metrics = self._train(params)
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._path_returns:
            metrics["avg_path_reward"] = float(np.mean(self._path_returns))
            self._path_returns.clear()
        return params, env_state, metrics

    def test_episodes(self, params, n_episodes: int = 32,
                      horizon: int = 512) -> tuple[float, float]:
        """TEST-mode evaluation (rl_agent.py:388-397): deterministic policy,
        returns (avg_return, avg_length)."""
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, n_episodes)
        state = jax.vmap(self.env.reset)(keys)

        @jax.jit
        def run(state):
            def step_fn(carry, _):
                st, alive, ret, length = carry
                a = jax.vmap(lambda o: self.agent.get_action(params, o))(st.obs)
                nxt = jax.vmap(self.env.step)(st, a)
                ret = ret + jnp.where(alive, nxt.reward, 0.0)
                length = length + jnp.where(alive, 1, 0)
                alive2 = alive & ~nxt.done
                st2 = jax.tree.map(
                    lambda new, old: jnp.where(
                        alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                    nxt, st)
                return (st2, alive2, ret, length), None

            alive = jnp.ones(n_episodes, bool)
            ret = jnp.zeros(n_episodes, jnp.float32)
            length = jnp.zeros(n_episodes, jnp.int32)
            carry, _ = jax.lax.scan(
                step_fn, (state, alive, ret, length), None, length=horizon)
            return carry[2], carry[3]

        ret, length = run(state)
        ret_sum = float(jnp.sum(ret))
        len_sum = float(jnp.sum(length))
        count = float(n_episodes)
        if jax.process_count() > 1:
            # distributed episode accounting: sum counts/returns across
            # hosts before averaging (rl_agent.py:521-584 reduce_sum)
            from jax.experimental import multihost_utils

            totals = multihost_utils.process_allgather(
                jnp.asarray([ret_sum, len_sum, count]))
            ret_sum, len_sum, count = (float(x) for x in totals.sum(axis=0))
        return ret_sum / count, len_sum / count
