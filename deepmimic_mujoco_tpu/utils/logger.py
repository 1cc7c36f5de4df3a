"""Tabular logger — the baselines-style logger the reference uses
(/root/reference/src/logger.py): key/value records per iteration dumped to
stdout (human table), CSV (self-rewriting header), JSON lines, and optional
TensorBoard; plus ProfileKV wall-time accumulation.

Env vars honored like the reference: ``OPENAI_LOGDIR``/``DMTPU_LOGDIR``,
``OPENAI_LOG_FORMAT``/``DMTPU_LOG_FORMAT`` (logger.py:345-375)."""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import os.path as osp
import sys
import tempfile
import time
from collections import defaultdict

DEBUG, INFO, WARN, ERROR, DISABLED = 10, 20, 30, 40, 50


class HumanOutputFormat:
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f"{val:<8.3g}" if hasattr(val, "__float__") else str(val)
            key2str[self._trunc(key)] = self._trunc(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items()):
            lines.append(
                f"| {key}{' ' * (keywidth - len(key))} | {val}{' ' * (valwidth - len(val))} |"
            )
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _trunc(s):
        return s[:20] + "..." if len(s) > 23 else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat:
    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        out = {}
        for k, v in kvs.items():
            if hasattr(v, "dtype"):
                v = float(v)
            out[k] = v
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat:
    """Self-rewriting-header CSV (reference logger.py:101-133)."""

    def __init__(self, filename):
        self.file = open(filename, "w+t")
        self.keys = []
        self.sep = ","

    def writekvs(self, kvs):
        extra_keys = [k for k in kvs.keys() if k not in self.keys]
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.write(",".join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line[:-1] + self.sep * len(extra_keys) + "\n")
        self.file.write(",".join(
            "" if kvs.get(k) is None else str(kvs.get(k)) for k in self.keys
        ) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


def make_output_format(fmt, ev_dir, log_suffix=""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format {fmt!r}")


class TensorBoardOutputFormat:
    """Per-iteration scalar summaries (reference logger.py:137-170) via the
    same TF-writer/JSONL machinery as utils.statistics.Stats."""

    def __init__(self, dirname: str):
        from deepmimic_mujoco_tpu.utils.statistics import Stats

        self._dir = dirname
        self._stats = Stats([], logdir=dirname)
        self._step = 0

    def writekvs(self, kvs):
        import math

        # drop non-finite values per-key (Stats.add_all_summary skips the
        # whole row if ANY value is NaN — e.g. EpLenMean before the first
        # episode completes — which would silently gap every other scalar)
        numeric = {k: v for k, v in sorted(kvs.items())
                   if isinstance(v, (int, float)) and math.isfinite(v)}
        self._stats.scalar_keys = list(numeric.keys())
        self._stats.add_all_summary(list(numeric.values()), self._step)
        self._step += 1

    def close(self):
        pass


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        if self.level == DISABLED:
            return
        for fmt in self.output_formats:
            if hasattr(fmt, "writekvs"):
                fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, HumanOutputFormat):
                    fmt.writeseq(map(str, args))

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def configure(dir=None, format_strs=None, log_suffix=""):
    if dir is None:
        dir = os.getenv("DMTPU_LOGDIR") or os.getenv("OPENAI_LOGDIR")
    if dir is None:
        dir = osp.join(
            tempfile.gettempdir(),
            datetime.datetime.now().strftime("dmtpu-%Y-%m-%d-%H-%M-%S-%f"),
        )
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        strs = os.getenv("DMTPU_LOG_FORMAT") or os.getenv("OPENAI_LOG_FORMAT")
        format_strs = strs.split(",") if strs else ["stdout", "log", "csv"]
    output_formats = [make_output_format(f, dir, log_suffix) for f in format_strs]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    log(f"Logging to {dir}")
    return Logger.CURRENT


def _get():
    if Logger.CURRENT is None:
        Logger.CURRENT = Logger(dir=None, output_formats=[HumanOutputFormat(sys.stdout)])
    return Logger.CURRENT


def logkv(key, val):
    _get().logkv(key, val)


def logkv_mean(key, val):
    _get().logkv_mean(key, val)


def record_tabular(key, val):
    logkv(key, val)


def dump_tabular():
    _get().dumpkvs()


def dumpkvs():
    _get().dumpkvs()


def log(*args, level=INFO):
    _get().log(*args, level=level)


def set_level(level):
    _get().set_level(level)


def get_dir():
    return _get().get_dir()


# --- wall-time profiling KVs (reference logger.py:260-285) ---
_profile_totals = defaultdict(float)


@contextlib.contextmanager
def profile_kv(scopename):
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        _get().name2val[logkey] += time.time() - tstart


def profile(n):
    def decorator_with_name(func):
        def func_wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return func_wrapper

    return decorator_with_name


@contextlib.contextmanager
def timed(msg, enabled=True, color="\033[35m"):
    """Phase timer printing to stdout (reference trpo.py:165-173 /
    console_util.timed)."""
    if enabled:
        print(f"{color}{msg}\033[0m")
        t = time.time()
        yield
        print(f"{color}done in {time.time() - t:.3f} seconds\033[0m")
    else:
        yield
