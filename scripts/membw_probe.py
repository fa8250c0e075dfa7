"""Memory-bandwidth ceiling of this box: a STREAM-triad-like numpy kernel
run in P concurrent PROCESSES (multiprocessing sidesteps the GIL and mimics
P executor threads each streaming through its own working set).

Context for the scaling suites (BENCH/scaling_*_64m.json): if aggregate
bandwidth stops growing well before 32 workers, a 4x core step cannot buy
4x throughput for a shuffle-heavy superstep workload no matter how the job
is partitioned — the efficiency ceiling is the memory bus, not the plan.

Writes BENCH/membw.json: {workers: GB/s} + derived saturation point.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N = 48_000_000  # floats per array: 3 arrays x 384 MB = ~1.15 GB per worker
REPS_SECONDS = 6.0


def worker(q: mp.Queue, barrier) -> None:
    import numpy as np

    a = np.ones(N)
    b = np.full(N, 2.0)
    c = np.zeros(N)
    # touch everything once (page-in before the barrier)
    c[:] = a
    barrier.wait()
    t0 = time.time()
    iters = 0
    while time.time() - t0 < REPS_SECONDS:
        np.multiply(b, 3.0, out=c)
        np.add(c, a, out=c)  # c = a + 3b: 3 streams/op pair like triad
        iters += 1
    dt = time.time() - t0
    # bytes moved per iteration: multiply reads b writes c (2 streams),
    # add reads c,a writes c (3 streams) => 5 * 8 * N bytes
    q.put(5 * 8 * N * iters / dt)


def run(workers: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(workers)
    procs = [mp.Process(target=worker, args=(q, barrier)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / 2**30


def main() -> None:
    out = {}
    for w in (1, 2, 4, 8, 16, 32):
        gbs = run(w)
        out[str(w)] = round(gbs, 1)
        print(f"{w:3d} workers: {gbs:8.1f} GiB/s aggregate", flush=True)
    os.makedirs("BENCH", exist_ok=True)
    sat = {
        "note": "aggregate STREAM-triad-like bandwidth by concurrent workers",
        "floats_per_array": N,
        "gib_per_sec": out,
    }
    with open("BENCH/membw.json", "w") as f:
        json.dump(sat, f, indent=1)
    print("-> BENCH/membw.json")


if __name__ == "__main__":
    main()
