#!/usr/bin/env python
"""Host-scaling decomposition probes (round 6).

Answers, with numbers, WHY the signature-stage 2->8 raw scaling
efficiency sits at ~0.61-0.67 on this sandbox even in an idle window
(BASELINE.json targets >= 0.8 between N and 4N executors; local
parallelism is the sanctioned sandbox proxy):

1. cpu        — pure-CPU pool efficiency at 2 vs 8 workers with a
                work unit big enough (~2.5s) that Pool fork/teardown
                does not dominate.  The 3M-iteration unit used by
                bench_scaling.calibrate_host under-reports the ceiling
                on an idle box (measured 0.57 vs 0.85 in the same
                window) because the burn is ~0.25s/worker.
2. curve      — median per-worker burn wall vs ACTIVE worker count
                (1..32).  This VM's per-thread throughput decays as
                threads rise (~0.95 @4 -> ~0.82 @16 -> ~0.72 @32):
                local[2] Spark runs ~4 busy threads (2 JVM + 2 Python
                workers), local[8] runs ~16, so the host itself caps
                the 2->8 wall ratio at curve(16)/curve(4) ~= 0.86
                before the engine does anything.
3. mem        — aggregate numpy copy bandwidth at 1/2/8 workers
                (64 MB working sets).  Measured scaling 2->8 ~= 0.98:
                memory bandwidth is NOT the binding constraint at 8
                workers, revising earlier rounds' "memory-bus
                saturation" reading of the flat pipeline scaling
                (which conflated co-tenant load with the host curve).

The fourth leg of the decomposition — stage occupancy and per-task
core-seconds at both levels — comes from the driver status store and
lives in the instrumented sig-stage run recorded in BENCH/BASELINE.md
(executorRunTime sum / (cores x wall) gives occupancy; the growth of
executorRunTime between levels gives the per-task slowdown the curve
above predicts).

Prints one JSON line.  Run in an idle window (load1 < ~3, vmstat
steal 0) or the numbers measure your co-tenants instead.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import time


def _burn(n: int) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i * i
    return time.perf_counter() - t0


def _pool_wall(w: int, n: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(w) as p:
        p.map(_burn, [n] * w)
    return time.perf_counter() - t0


def cpu_ceiling(n: int = 30_000_000) -> dict:
    base = _pool_wall(1, n)
    r2, r8 = _pool_wall(2, n), _pool_wall(8, n)
    eff = {1: 1.0, 2: round(base / r2, 3), 8: round(base / r8, 3)}
    return {"eff": eff, "ceiling_2to8": round((base / r8 * 8) / (base / r2 * 2) / 4.0, 3)}


def per_thread_curve(n: int = 30_000_000, widths=(1, 2, 4, 8, 16, 32)) -> dict:
    walls = {}
    for w in widths:
        with mp.Pool(w) as p:
            walls[w] = round(statistics.median(p.map(_burn, [n] * w)), 3)
    base = walls[min(widths)]
    return {
        "median_wall": walls,
        "speed_vs_1": {w: round(base / v, 3) for w, v in walls.items()},
    }


def _stream(n_mb: int) -> float:
    import numpy as np

    a = np.zeros(n_mb * 131072, dtype=np.float64)
    b = np.zeros_like(a)
    t0 = time.perf_counter()
    loops = 0
    while time.perf_counter() - t0 < 3.0:
        np.copyto(b, a)
        np.copyto(a, b)
        loops += 1
    return (2 * n_mb * loops) / (time.perf_counter() - t0)


def mem_scaling(n_mb: int = 64) -> dict:
    agg = {}
    for w in (1, 2, 8):
        with mp.Pool(w) as p:
            agg[w] = round(sum(p.map(_stream, [n_mb] * w)))
    return {"agg_MBps": agg, "eff_2to8": round((agg[8] / agg[2]) / 4.0, 3)}


def main() -> None:
    print(json.dumps({
        "load1": round(os.getloadavg()[0], 2),
        "cpu": cpu_ceiling(),
        "curve": per_thread_curve(),
        "mem": mem_scaling(),
    }))


if __name__ == "__main__":
    main()
