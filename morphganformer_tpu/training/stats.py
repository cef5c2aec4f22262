"""Training statistics collection.

Behavioral spec: torch_utils/training_stats.py in the reference — per-name
moment triples [n, sum(x), sum(x^2)] accumulated lock-free per device
(:12,72-76), synced across processes on Collector.update(), exposed as
mean/std; report/report0 API (:63-89).

Here stats are plain numpy moment triples accumulated on host from the
jitted step's aux outputs. No explicit cross-process sync is needed or
implemented: the jitted steps compute their scalars over the globally
sharded batch, so under SPMD every process already observes the
globally-reduced value; each host's Collector therefore holds identical
moments (the reference needed an all_reduce because each rank computed
only its own shard, training_stats.py:222-226).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from typing import Dict

import numpy as np


class Collector:
    """Accumulate [n, sum, sum_sq] per name; query mean/std; jsonl export."""

    def __init__(self):
        self._moments = defaultdict(lambda: np.zeros(3, np.float64))

    def report(self, name: str, value):
        value = np.asarray(value, dtype=np.float64).ravel()
        m = self._moments[name]
        m[0] += value.size
        m[1] += value.sum()
        m[2] += np.square(value).sum()

    def report_dict(self, d: Dict):
        for k, v in d.items():
            self.report(k, np.asarray(v))

    def mean(self, name: str) -> float:
        m = self._moments[name]
        return float(m[1] / m[0]) if m[0] > 0 else float("nan")

    def std(self, name: str) -> float:
        m = self._moments[name]
        if m[0] < 1:
            return float("nan")
        mean = m[1] / m[0]
        return float(np.sqrt(max(m[2] / m[0] - mean * mean, 0)))

    def names(self):
        return sorted(self._moments)

    def as_dict(self):
        return {name: {"num": float(self._moments[name][0]),
                       "mean": self.mean(name), "std": self.std(name)}
                for name in self.names()}

    def reset(self):
        self._moments.clear()

    def write_jsonl(self, path, **extra):
        """stats.jsonl line per tick (reference training_loop.py:289-294)."""
        entry = dict(self.as_dict(), timestamp=time.time(), **extra)
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")
