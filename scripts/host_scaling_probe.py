#!/usr/bin/env python
"""Host scaling-ceiling probe: how much of a multi-core slowdown is the
BOX, not the job?

Two synthetic workloads, each run as 1, `--low`, and `--high` pinned
single-core processes (the same taskset protocol the scaling benches
use), measuring the PER-CORE rate at each width:

  cpu     a pure-register arithmetic spin — no memory traffic.  Its
          per-core decay isolates hypervisor frequency/steal effects.
  stream  a sequential numpy sum over a ~200 MB array — pure DRAM
          streaming.  Its per-core decay exposes the shared memory
          controller: on this sandbox VM total bandwidth saturates at
          ~7 GB/s, so per-core bandwidth collapses ~3.7x from 2 to 8
          readers (measured 2026-08-18).

Why this matters for the two-cluster-size criterion: the sandbox can
only emulate N vs 4N executors as 2 vs 8 cores of ONE box sharing ONE
memory controller.  A bandwidth-bound stage (href regex over raw html
streams bytes; the KG pipeline's model UDFs are compute-dense and are
not) therefore hits a HOST ceiling that a real N -> 4N cluster — where
every added node brings its own memory channels — does not have.  The
probe quantifies that ceiling so a scaling number can be read next to
it: job efficiency should be judged against min(1, cpu_scaling,
achievable bandwidth share), not against 1.0.

Writes BENCH/host_probe.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spin(n: int) -> float:
    x = 1.0001
    t0 = time.perf_counter()
    for _ in range(n):
        x = x * 1.0000001 + 0.0000001
    el = time.perf_counter() - t0
    # keep x alive so the loop cannot be elided
    return n / el if x > 0 else 0.0


def _stream(passes: int) -> float:
    import numpy as np

    a = np.ones(200_000_000 // 8)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(passes):
        s += a.sum()
    el = time.perf_counter() - t0
    return passes * a.nbytes / el / 1e9 if s > 0 else 0.0


def _inner(kind: str) -> None:
    if kind == "cpu":
        print(json.dumps({"rate": _spin(30_000_000), "unit": "iters/s"}))
    else:
        print(json.dumps({"rate": _stream(20), "unit": "GB/s"}))


def _run_width(kind: str, width: int) -> dict:
    """width pinned single-core processes, one per core, concurrently."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable,
             os.path.abspath(__file__), "--inner", kind],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(width)
    ]
    rates = [json.loads(p.communicate()[0].strip())["rate"] for p in procs]
    return {
        "width": width,
        "per_core_rate": round(sum(rates) / len(rates), 1),
        "total_rate": round(sum(rates), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", choices=["cpu", "stream"])
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()
    if args.inner:
        _inner(args.inner)
        return

    out: dict = {"low": args.low, "high": args.high, "workloads": {}}
    for kind in ("cpu", "stream"):
        levels = [_run_width(kind, w) for w in (1, args.low, args.high)]
        lo = next(l for l in levels if l["width"] == args.low)
        hi = next(l for l in levels if l["width"] == args.high)
        out["workloads"][kind] = {
            "unit": "iters/s" if kind == "cpu" else "GB/s",
            "levels": levels,
            # per-core retention from low to high width: the job-
            # independent ceiling an N->4N emulation on this box has
            "per_core_retention_low_to_high": round(
                hi["per_core_rate"] / lo["per_core_rate"], 3
            ),
            "implied_efficiency_ceiling": round(
                hi["total_rate"] / lo["total_rate"]
                / (args.high / args.low), 3
            ),
        }
    path = os.path.join(REPO, "BENCH", "host_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
