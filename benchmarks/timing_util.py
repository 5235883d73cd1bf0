"""Shared marginal-timing helper for the benchmark harnesses.

Per-call timing through the axon relay is dominated by a ~30-55 ms
FIXED dispatch+fetch cost; the slope between two iteration counts
cancels it (see PERF.md "Device-honest component numbers").  One copy
here so bench_device.py and bench_fused_ce.py cannot drift.
"""

from __future__ import annotations

import time

import numpy as np


def marginal_ms(make_run, n_lo: int = 30, n_hi: int = 120, reps: int = 5):
    """``make_run(n)`` must execute n iterations and return something
    fetchable.  Returns (marginal ms/iteration, median call ms at n_lo).
    The first call per n compiles + warms; medians over ``reps``."""
    per = {}
    for n in (n_lo, n_hi):
        np.asarray(make_run(n))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(make_run(n))
            ts.append(time.perf_counter() - t0)
        per[n] = float(np.median(ts))
    return (per[n_hi] - per[n_lo]) / (n_hi - n_lo) * 1000, per[n_lo] * 1000
