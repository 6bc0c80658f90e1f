"""Shared benchmarking calibration.

``clock_probe`` is THE cross-round normalization constant every BENCH
artifact records (this VM's per-core clock swings ±3× within an hour, so
absolute walls are only comparable after dividing by the probe).  One
implementation, imported everywhere — a drifted copy would silently
desynchronize the probe-normalized ratios across artifacts.
"""

from __future__ import annotations

import time


def clock_probe(n: int = 20_000_000) -> float:
    """Single-core python integer throughput in M iterations/sec.

    The loop body (``x += i`` over ``range``) is pinned: it is the exact
    workload every committed BENCH artifact was calibrated with."""
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i
    return round(n / 1e6 / (time.time() - t0), 2)
