"""Episode monitor — headered CSV of per-episode {r, l, t}
(reference: /root/reference/src/bench/monitor.py:12-122).

The reference wraps a gym env; here episodes finish inside jitted batched
rollouts, so the monitor ingests (return, length) pairs post-hoc from the
iteration stats while keeping the same on-disk format (JSON header line
starting with '#', then CSV with columns r,l,t) so the reference's
``load_results``/plotting tooling reads it unchanged."""

from __future__ import annotations

import csv
import json
import os
import time

EXT = "monitor.csv"


class Monitor:
    def __init__(self, filename: str, env_id: str = "dp_env_v3"):
        self.tstart = time.time()
        if not filename.endswith(EXT):
            if os.path.isdir(filename):
                filename = os.path.join(filename, EXT)
            else:
                filename = filename + "." + EXT
        self.f = open(filename, "wt")
        self.f.write("#%s\n" % json.dumps(
            {"t_start": self.tstart, "env_id": env_id}))
        self.writer = csv.DictWriter(self.f, fieldnames=("r", "l", "t"))
        self.writer.writeheader()
        self.f.flush()
        self.episode_rewards = []
        self.episode_lengths = []

    def record(self, ep_ret: float, ep_len: int) -> None:
        epinfo = {
            "r": round(float(ep_ret), 6),
            "l": int(ep_len),
            "t": round(time.time() - self.tstart, 6),
        }
        self.episode_rewards.append(epinfo["r"])
        self.episode_lengths.append(epinfo["l"])
        self.writer.writerow(epinfo)
        self.f.flush()

    def close(self):
        self.f.close()


def load_results(path: str):
    """Read a monitor CSV back (reference monitor.py:128-165); returns a
    pandas DataFrame with episode rows and header metadata."""
    import pandas

    with open(path) as f:
        first = f.readline()
        assert first.startswith("#"), "not a monitor file"
        header = json.loads(first[1:])
        df = pandas.read_csv(f, index_col=None)
    df["t"] += header["t_start"]
    df.attrs["headers"] = header
    return df
