"""Host CPU-scaling probe: how many EFFECTIVE cores does this box give
a perfectly parallel numpy workload right now?

The sandbox VM advertises 32 cores but is host-shared: identical
per-worker work slows down as worker count grows (memory-bandwidth and
neighbor contention, time-varying).  The probe runs the same fixed
per-worker kernel at 1/2/8/32 workers and reports the per-worker
slowdown vs 1 worker — the hardware ceiling any engine's N→4N scaling
efficiency is capped by, independent of Spark.

Printed JSON: {"w1": 1.0, "w2": ..., "w8": ..., "w32": ...} where the
value is wall(w workers)/wall(1 worker) for identical per-worker work
(1.0 = perfect).  The max achievable scaling efficiency between worker
counts a < b is slowdown(a)/slowdown(b) … i.e. eff_cap(a→b) =
slowdown(a)/slowdown(b).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

ITERS = 1500
SIZE = 200_000


def _burn(n: int) -> int:
    a = np.random.RandomState(0).randint(0, 1 << 30, SIZE).astype(np.uint64)
    for _ in range(n):
        h = (a * np.uint64(1000003)) % np.uint64((1 << 61) - 1)
        a = h ^ (h >> np.uint64(7))
    return 0


def _run(workers: int) -> float:
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(_burn, [ITERS] * workers)
        return time.time() - t0


def probe(repeats: int = 2) -> dict[str, float]:
    base = min(_run(1) for _ in range(repeats))
    out = {"w1": 1.0}
    for w in (2, 8, 32):
        out[f"w{w}"] = round(min(_run(w) for _ in range(repeats)) / base, 3)
    return out


if __name__ == "__main__":
    print(json.dumps(probe()))
