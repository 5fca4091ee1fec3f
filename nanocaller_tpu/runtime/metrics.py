"""Tracing / metrics: per-stage timing + jax.profiler hooks.

The reference has no profiling beyond timestamped prints (SURVEY.md
§5.1); here every pipeline stage reports wall time and counters into a
run-wide registry serialized next to the VCFs, and a TPU trace can be
captured around any region with `profile_region`.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


class Metrics:
    def __init__(self):
        self.timers = defaultdict(float)
        self.counts = defaultdict(int)
        self.extra = {}  # e.g. psum-reduced global counts in multi-host runs

    @contextlib.contextmanager
    def timer(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[name] += time.perf_counter() - t0

    def count(self, name, k=1):
        self.counts[name] += k

    def as_dict(self):
        d = {"timers_s": {k: round(v, 4) for k, v in self.timers.items()},
             "counts": dict(self.counts)}
        d.update(self.extra)
        return d

    def dump(self, path):
        with open(path, "w") as fh:
            json.dump(self.as_dict(), fh, indent=1)
        return path


GLOBAL = Metrics()


@contextlib.contextmanager
def profile_region(log_dir, enabled=True):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
