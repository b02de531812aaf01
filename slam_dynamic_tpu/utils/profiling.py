"""Tracing / profiling / structured logging.

Replaces the reference's std::chrono bracket timing (per-stage timers in
the drivers, /root/reference/Examples/Stereo/stereo_kitti.cc:95-144 and
median/mean summary :161-170) and cout diagnostics (SURVEY §5.1/§5.5) with:
  - `StageTimer`: per-stage wall timers with median/mean summaries;
  - `trace` / `annotate`: jax.profiler trace contexts (xprof-compatible);
  - `log_event`: one-line JSON structured logging.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class StageTimer:
    """Accumulates wall time per named stage; prints reference-style
    median/mean summaries."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(xs),
                "median_ms": float(np.median(a) * 1e3),
                "mean_ms": float(a.mean() * 1e3),
                "max_ms": float(a.max() * 1e3),
            }
        return out

    def report(self, file=sys.stderr):
        for name, s in sorted(self.summary().items()):
            print(f"[timer] {name}: median {s['median_ms']:.2f} ms "
                  f"mean {s['mean_ms']:.2f} ms (n={s['n']})", file=file)


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in xprof/perfetto traces."""
    import jax.profiler
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with xprof/tensorboard)."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_event(event: str, **fields):
    """Structured one-line JSON log (replaces scattered cout prints)."""
    rec = {"event": event, "t": time.time(), **fields}
    print(json.dumps(rec), file=sys.stderr, flush=True)
