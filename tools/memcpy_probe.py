"""Ray-free sandbox-health probe: fresh-allocation vs prefaulted memcpy
bandwidth.

This sandbox's hypervisor serializes page-fault service: bandwidth through
FRESHLY ALLOCATED pages collapses (measured as low as 0.5 GB/s single-proc
during round 4, vs ~84 GB/s prefaulted on the same machine seconds apart),
and the degradation level drifts over hours. Any allocating data pipeline
— every Ray worker materializing new Arrow buffers — is capped by it, so
absolute wall-clock numbers from different windows are NOT comparable.
Run this probe next to any benchmark and record both numbers; compare
benchmarks only within a window of similar probe readings.

Usage: python tools/memcpy_probe.py [n_procs]
Prints one JSON line: fresh/prefaulted GB/s at 1 and n procs.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

MB = 320


def _one(fresh: bool) -> float:
    a = np.random.rand(MB * 125_000 // 8)  # ~MB megabytes
    if not fresh:
        b = np.empty_like(a)
    t0 = time.perf_counter()
    for _ in range(5):
        if fresh:
            b = np.empty_like(a)
        np.copyto(b, a)
    return 5 * MB / 1000 / (time.perf_counter() - t0)


def _worker(fresh: bool, q) -> None:
    q.put(_one(fresh))


def probe(n_procs: int) -> dict:
    out = {"fresh_1p": round(_one(True), 2),
           "prefault_1p": round(_one(False), 2)}
    if n_procs > 1:
        for fresh, key in ((True, f"fresh_{n_procs}p"),
                           (False, f"prefault_{n_procs}p")):
            q = mp.Queue()
            ps = [mp.Process(target=_worker, args=(fresh, q))
                  for _ in range(n_procs)]
            for p in ps:
                p.start()
            vals = [q.get() for _ in ps]
            for p in ps:
                p.join()
            out[key] = round(sum(vals), 2)  # aggregate GB/s
    out["unit"] = "GB/s"
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(probe(n)))
