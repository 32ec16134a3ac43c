#!/usr/bin/env python
"""Aggregate-CPU throttle probe — the control the single-core chain
check cannot provide.

This sandbox VM caps AGGREGATE CPU after sustained all-core load: the
round-3 session measured, back to back, single-core controls flat
(0.189 -> 0.190 s/3000 docs) while the same 200k index build collapsed
from 22k docs/s (recorded quiet window) to 3.5k docs/s at local[32] —
with local[8] simultaneously FASTER than its quiet baseline.  A cap on
the sum of core-seconds binds only the wide level, so a 1-core probe
shows nothing.

This probe measures pure-CPU aggregate throughput (blake2b over an
in-cache 1 MB buffer — no DRAM-bus or Spark effects) at 1, 8 and 32
processes.  In an unthrottled window agg(32)/agg(8) ~= 4; under the cap
it approaches 1.  Run BEFORE and AFTER any scaling measurement: the pair
of probes brackets the window's health and makes throttle distinguishable
from code regression.

Usage: python BENCH/cpu_control.py [iters_per_proc]   (default 300)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(n_iter: int) -> float:
    import hashlib
    buf = b"\xab" * (1 << 20)
    t0 = time.time()
    for _ in range(n_iter):
        hashlib.blake2b(buf).digest()
    return time.time() - t0


def probe(nproc: int, n_iter: int) -> dict:
    t0 = time.time()
    with mp.Pool(nproc) as pool:
        pool.map(_work, [n_iter] * nproc)
    wall = time.time() - t0
    return {"procs": nproc, "wall_sec": round(wall, 3),
            "agg_mb_per_sec": round(nproc * n_iter / wall, 1)}


def main() -> None:
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    levels = [probe(n, n_iter) for n in (1, 8, 32)]
    by = {p["procs"]: p["agg_mb_per_sec"] for p in levels}
    out = {"levels": levels,
           "agg_scaling_32_vs_8": round(by[32] / by[8], 3),
           "agg_scaling_8_vs_1": round(by[8] / by[1], 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
