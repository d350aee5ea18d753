"""Measure this box's effective DRAM bandwidth (STREAM-triad style).

Used to pin the pairs-stage scaling argument: if a stage's aggregate
(shuffle read + write + working-set) bytes/s at local[8] already sits
near the measured all-cores DRAM ceiling, adding workers cannot scale
it on ONE box — the same job on a real cluster gets 4x the memory
channels along with 4x the executors, which is why the on-box
efficiency number understates cluster scaling.

Runs `a = b * scalar + c` (triad: 3 streamed arrays, 24 B/element
traffic minimum) over arrays far larger than LLC, in 1..N concurrent
processes (separate processes — no GIL, separate numpy buffers), and
reports aggregate GB/s per level.

Usage: python tools/membw_probe.py [max_procs ...levels]
Prints one JSON line: {"triad_gbps": {"1": x, "8": y, ...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ELEMENTS = 50_000_000  # 3 x 400 MB float64 — far beyond any LLC
REPEATS = 3


def _triad_worker(out_queue) -> None:
    import numpy as np

    b = np.random.rand(ELEMENTS)
    c = np.random.rand(ELEMENTS)
    a = np.empty_like(b)
    # warm-up (page-in)
    np.multiply(b, 1.1, out=a)
    a += c
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.multiply(b, 1.1, out=a)
        a += c
        best = min(best, time.perf_counter() - t0)
    # triad traffic: read b, read c, read+write a (write-allocate) —
    # count the conventional 3 streams x 8 B (lower bound).
    out_queue.put(3 * 8 * ELEMENTS / best)


def triad_gbps(num_procs: int) -> float:
    queue: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_triad_worker, args=(queue,))
        for _ in range(num_procs)
    ]
    for p in procs:
        p.start()
    total = sum(queue.get() for _ in procs)
    for p in procs:
        p.join()
    return round(total / 1e9, 2)


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 16, 32]
    result = {str(k): triad_gbps(k) for k in levels}
    print(json.dumps({"triad_gbps": result}))


if __name__ == "__main__":
    main()
