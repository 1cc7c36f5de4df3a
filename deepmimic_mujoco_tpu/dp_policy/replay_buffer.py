"""Path-structured replay buffer
(reference: /root/reference/src/dp_policy_testing/learning/replay_buffer.py):
a flat ring of per-step records with per-path bookkeeping.

Layout matches the original: a path of n steps occupies **n+1 records** —
one per visited state, the last being the bootstrap/terminal state with
``is_end=True`` and the path's terminate flag (replay_buffer.py:34-70 via
rl_agent._update_new_action/_end_path: states n+1, actions/rewards/logps n).
Samplers filter path-end records; ``get_idx_filtered`` returns records whose
flags carry a given bit (the original's ``SampleBuffer`` free-lists,
replay_buffer.py:275-350 — here a simple masked scan, same contract).

Host-side numpy (the original's is too); training consumers copy sampled
batches to device."""

from __future__ import annotations

import numpy as np

from deepmimic_mujoco_tpu.dp_policy.path import Path, Terminate


class ReplayBuffer:
    def __init__(self, buffer_size: int):
        self.buffer_size = buffer_size
        self.total_count = 0          # total *sample* (action) count ever stored
        self.buffer_head = 0
        self.buffer_tail = 0
        self.num_paths = 0
        self._store: dict[str, np.ndarray] = {}
        self._path_id = np.full(buffer_size, -1, np.int64)
        self._is_end = np.zeros(buffer_size, bool)
        self._terminate = np.zeros(buffer_size, np.int8)
        self._flags = np.zeros(buffer_size, np.int32)
        self._curr_path = -1
        self._used = 0                # records currently occupied

    def get_current_size(self) -> int:
        """Number of records currently in the ring (incl. path ends)."""
        return self._used

    def count_filtered(self, flag: int) -> int:
        """Records whose flags carry ``flag`` (ppo_agent._valid_train_step
        uses this for the EXP_ACTION count)."""
        idx = np.arange(self._used)
        return int(np.sum((self._flags[idx] & flag) != 0))

    def store(self, path: Path) -> int:
        """Append a path as n+1 records; returns its id
        (replay_buffer.py:34-70)."""
        n = path.pathlength()
        if n == 0:
            return -1
        self._curr_path += 1
        idx = (self.buffer_head + np.arange(n + 1)) % self.buffer_size

        def put(key, vals, width_hint=None):
            vals = np.asarray(vals, np.float32)
            if key not in self._store:
                shape = (self.buffer_size,) + vals.shape[1:]
                self._store[key] = np.zeros(shape, np.float32)
            self._store[key][idx[: len(vals)]] = vals
            # pad the remaining records (the end record has no action/reward)
            for j in idx[len(vals):]:
                self._store[key][j] = 0.0

        put("states", np.asarray(path.states)[: n + 1])
        put("actions", path.actions)
        put("rewards", path.rewards)
        if path.logps:
            put("logps", path.logps)
        if path.goals:
            put("goals", np.asarray(path.goals)[: n + 1])
        self._path_id[idx] = self._curr_path
        self._is_end[idx] = False
        self._is_end[idx[-1]] = True
        self._terminate[idx] = Terminate.NULL
        self._terminate[idx[-1]] = path.terminate
        self._flags[idx] = 0
        if path.flags:
            self._flags[idx[:n]] = np.asarray(path.flags, np.int32)
        self.buffer_head = int((idx[-1] + 1) % self.buffer_size)
        self.total_count += n
        self._used = min(self._used + n + 1, self.buffer_size)
        self.num_paths += 1
        return self._curr_path

    def sample(self, n: int, filter_end: bool = True,
               rng: np.random.RandomState | None = None) -> np.ndarray:
        """Sample record indices; with ``filter_end`` only records whose
        successor belongs to the same path (i.e. non-end records,
        replay_buffer.py sample loop)."""
        rng = rng or np.random
        size = self.get_current_size()
        assert size > 0
        cand = np.arange(size)
        if filter_end:
            nxt = (cand + 1) % self.buffer_size
            ok = (~self._is_end[cand]) & (self._path_id[cand] >= 0)
            ok &= self._path_id[nxt] == self._path_id[cand]
            cand = cand[ok]
        return rng.choice(cand, size=n, replace=len(cand) < n)

    def get_idx_filtered(self, flag: int) -> np.ndarray:
        """All record indices whose flags carry ``flag``
        (replay_buffer.get_idx_filtered)."""
        idx = np.arange(self._used)
        return idx[(self._flags[idx] & flag) != 0]

    def get(self, key: str, idx: np.ndarray) -> np.ndarray:
        return self._store[key][idx]

    def get_all(self, key: str) -> np.ndarray:
        return self._store[key][: self._used]

    def get_next_idx(self, idx: np.ndarray) -> np.ndarray:
        return (idx + 1) % self.buffer_size

    def is_path_end(self, idx: np.ndarray) -> np.ndarray:
        return self._is_end[idx]

    def check_terminal_flag(self, idx: np.ndarray, flag: int) -> np.ndarray:
        return self._is_end[idx] & (self._terminate[idx] == flag)

    def end_mask(self) -> np.ndarray:
        return self._is_end[: self._used].copy()

    def fail_mask(self) -> np.ndarray:
        return self.end_mask() & (self._terminate[: self._used] == Terminate.FAIL)

    def succ_mask(self) -> np.ndarray:
        return self.end_mask() & (self._terminate[: self._used] == Terminate.SUCC)

    def flag_mask(self, flag: int) -> np.ndarray:
        return (self._flags[: self._used] & flag) != 0

    def clear(self):
        """Reset the ring (the on-policy PPO stack clears after every train
        step, ppo_agent.py:260)."""
        self.buffer_head = 0
        self.buffer_tail = 0
        self.num_paths = 0
        self._used = 0
        self._path_id[:] = -1
        self._is_end[:] = False
        self._flags[:] = 0
