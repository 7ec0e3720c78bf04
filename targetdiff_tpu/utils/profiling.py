"""First-class profiling support (the reference has none — SURVEY.md §5;
only wall-clock brackets around sampling batches,
reference: scripts/sample_diffusion.py:44,113-114).

Wraps jax.profiler tracing and parses the emitted Chrome trace into a per-op
time table, so kernel-level hotspots are visible without TensorBoard.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import time
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/targetdiff_trace"):
    """Context manager: profiles everything inside, returns the trace dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def op_time_table(log_dir: str, top: int = 30) -> List[Tuple[float, int, str]]:
    """Parse the newest Chrome trace under `log_dir` into
    [(total_ms, count, op_name)] sorted by total time."""
    paths = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        trace_data = json.load(f)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in trace_data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$") or name.startswith("jit_") or name == "while":
                continue  # python-side / umbrella rows
            dur[name] += e["dur"]
            cnt[name] += 1
    rows = [(d / 1e3, cnt[n], n) for n, d in dur.most_common(top)]
    return rows


def print_op_table(log_dir: str, top: int = 30) -> None:
    for ms, n, name in op_time_table(log_dir, top):
        print(f"{ms:9.2f}ms  x{n:<6} {name[:90]}")


class Timer:
    """Cheap phase timer with named laps (wall clock, host side)."""

    def __init__(self):
        self.laps: Dict[str, float] = collections.defaultdict(float)
        self._t: Optional[float] = None
        self._phase: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.laps[name] += time.time() - t0

    def summary(self) -> str:
        total = sum(self.laps.values())
        lines = [f"total {total:.2f}s"]
        for k, v in sorted(self.laps.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:24s} {v:8.2f}s  {100 * v / max(total, 1e-9):5.1f}%")
        return "\n".join(lines)
