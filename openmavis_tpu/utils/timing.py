"""Per-stage pipeline timing, the REGISTER_TIMES equivalent.

(reference: the `REGISTER_TIMES` compile flag wraps every pipeline stage in
std::chrono timers and Tracking::PrintTimeStats dumps mean/std tables,
include/Settings.h:4-5, src/Tracking.cc:239-498.) Here timing is always on
(cost is one perf_counter pair per stage) and keeps the reference's stage
taxonomy so numbers are comparable.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def stats(self):
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "mean_ms": float(a.mean() * 1e3),
                "std_ms": float(a.std() * 1e3),
                "median_ms": float(np.median(a) * 1e3),
                "count": len(a),
            }
        return out

    def print_stats(self, file=None):
        """Tracking::PrintTimeStats equivalent."""
        stats = self.stats()
        width = max((len(k) for k in stats), default=10)
        lines = [f"{'stage'.ljust(width)}  mean_ms  std_ms  median  count"]
        for name in sorted(stats):
            s = stats[name]
            lines.append(
                f"{name.ljust(width)}  {s['mean_ms']:7.2f} {s['std_ms']:7.2f}"
                f" {s['median_ms']:7.2f}  {s['count']:5d}")
        text = "\n".join(lines)
        print(text, file=file)
        return text
