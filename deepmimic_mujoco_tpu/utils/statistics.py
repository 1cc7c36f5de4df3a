"""TensorBoard scalar stats — the reference's ``stats`` class
(/root/reference/src/statistics.py): named scalar summaries written per
iteration, with a NaN guard (statistics.py:37-38).

Uses TF's summary writer when TensorFlow is importable (it is in the target
image); otherwise falls back to a JSONL file so the capability degrades
gracefully."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Sequence


class Stats:
    def __init__(self, scalar_keys: Sequence[str] = (), logdir: str = "/tmp/experiments"):
        self.scalar_keys = list(scalar_keys)
        path = os.path.join(logdir, str(int(time.time())))
        os.makedirs(path, exist_ok=True)
        self._writer = None
        self._jsonl = None
        try:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(path)
        except Exception:
            self._jsonl = open(os.path.join(path, "stats.jsonl"), "a")

    def add_all_summary(self, values: Sequence[float], step: int) -> None:
        """Write one scalar per key; skip non-finite values
        (statistics.py:34-45)."""
        if any((v is None) or (isinstance(v, float) and math.isnan(v)) for v in values):
            return
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                for k, v in zip(self.scalar_keys, values):
                    tf.summary.scalar(k, float(v), step=step)
                self._writer.flush()
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, **{k: float(v) for k, v in zip(self.scalar_keys, values)}}
            ) + "\n")
            self._jsonl.flush()


# reference alias
stats = Stats
