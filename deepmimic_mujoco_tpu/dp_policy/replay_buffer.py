"""Path-structured replay buffer
(reference: /root/reference/src/dp_policy_testing/learning/replay_buffer.py):
a flat ring of per-step records with per-path bookkeeping; supports filtered
sampling of indices whose successor is inside the same path (the original's
end-of-path masking) and terminal-flag logic.

Host-side numpy (the original's is too); training consumers copy sampled
batches to device."""

from __future__ import annotations

import numpy as np

from deepmimic_mujoco_tpu.dp_policy.path import Path, Terminate


class ReplayBuffer:
    def __init__(self, buffer_size: int):
        self.buffer_size = buffer_size
        self.total_count = 0
        self.buffer_head = 0
        self.num_paths = 0
        self._store: dict[str, np.ndarray] = {}
        self._path_id = np.full(buffer_size, -1, np.int64)
        self._is_end = np.zeros(buffer_size, bool)
        self._terminate = np.zeros(buffer_size, np.int8)
        self._curr_path = -1
        self._sample_count = 0

    def get_current_size(self) -> int:
        return min(self.total_count, self.buffer_size)

    def store(self, path: Path) -> int:
        """Append a path; returns its id (replay_buffer.py:34-70)."""
        n = path.pathlength()
        if n == 0:
            return -1
        self._curr_path += 1
        idx = (self.buffer_head + np.arange(n)) % self.buffer_size

        def put(key, vals):
            vals = np.asarray(vals)
            if key not in self._store:
                shape = (self.buffer_size,) + vals.shape[1:]
                self._store[key] = np.zeros(shape, vals.dtype)
            self._store[key][idx] = vals[:n]

        put("states", np.asarray(path.states)[:n])
        put("actions", path.actions)
        put("rewards", path.rewards)
        if path.logps:
            put("logps", path.logps)
        if path.goals:
            put("goals", np.asarray(path.goals)[:n])
        self._path_id[idx] = self._curr_path
        self._is_end[idx] = False
        self._is_end[idx[-1]] = True
        self._terminate[idx[-1]] = path.terminate
        self.buffer_head = int((idx[-1] + 1) % self.buffer_size)
        self.total_count += n
        self.num_paths += 1
        return self._curr_path

    def sample(self, n: int, filter_end: bool = True,
               rng: np.random.RandomState | None = None) -> np.ndarray:
        """Sample indices; with ``filter_end`` only indices whose successor
        belongs to the same path (replay_buffer.py sample filters)."""
        rng = rng or np.random
        size = self.get_current_size()
        assert size > 0
        cand = np.arange(size)
        if filter_end:
            nxt = (cand + 1) % self.buffer_size
            ok = (~self._is_end[cand]) & (self._path_id[cand] >= 0)
            ok &= self._path_id[nxt] == self._path_id[cand]
            cand = cand[ok]
        self._sample_count += n
        return rng.choice(cand, size=n, replace=len(cand) < n)

    def get(self, key: str, idx: np.ndarray) -> np.ndarray:
        return self._store[key][idx]

    def get_next_idx(self, idx: np.ndarray) -> np.ndarray:
        return (idx + 1) % self.buffer_size

    def is_path_end(self, idx: np.ndarray) -> np.ndarray:
        return self._is_end[idx]

    def check_terminal_flag(self, idx: np.ndarray, flag: int) -> np.ndarray:
        return self._is_end[idx] & (self._terminate[idx] == flag)

    def clear(self):
        self.total_count = 0
        self.buffer_head = 0
        self.num_paths = 0
        self._path_id[:] = -1
        self._is_end[:] = False
