"""Per-stage encode profiling (reference analog: the always-on frame timing
telemetry of x265_frame_stats — x265.h:273-289, frameencoder.h:175-187 — and
the ProfileScopeEvent buckets of profile/cpuEvents.h).

Round-2 lesson: the project flew blind on where frame time went (device
compute vs tunnel transfer vs host entropy), and the bench fiasco followed.
This is a zero-dependency accumulator: `with prof("device"):` around stages,
`prof.report()` for a dict of {stage: (total_s, calls)}.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageProfiler:
    def __init__(self):
        self.acc = defaultdict(float)
        self.calls = defaultdict(int)
        self.enabled = False

    @contextmanager
    def __call__(self, stage: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[stage] += time.perf_counter() - t0
            self.calls[stage] += 1

    def reset(self):
        self.acc.clear()
        self.calls.clear()

    def report(self) -> dict:
        return {k: {"total_s": round(v, 3), "calls": self.calls[k],
                    "ms_per_call": round(1000.0 * v / max(self.calls[k], 1),
                                         1)}
                for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])}


# process-wide profiler; sessions share it (one encode at a time per process)
PROF = StageProfiler()
