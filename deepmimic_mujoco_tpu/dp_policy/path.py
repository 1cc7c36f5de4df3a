"""Trajectory container
(reference: /root/reference/src/dp_policy_testing/learning/path.py)."""

from __future__ import annotations

import numpy as np


class Terminate:
    NULL = 0
    FAIL = 1
    SUCC = 2


class Path:
    def __init__(self):
        self.clear()

    def clear(self):
        self.states: list = []
        self.goals: list = []
        self.actions: list = []
        self.logps: list = []
        self.rewards: list = []
        self.flags: list = []
        self.terminate = Terminate.NULL
        return

    def pathlength(self) -> int:
        return len(self.actions)

    def is_valid(self) -> bool:
        l = self.pathlength()
        return (len(self.states) == l + 1 and len(self.actions) == l
                and len(self.rewards) == l)

    def calc_return(self) -> float:
        return float(np.sum(self.rewards))
