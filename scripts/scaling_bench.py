#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion, sandbox form (per driver instruction): the IDENTICAL KG
construction job at two parallelism levels on the same input.

Controls for the confounders that wrecked the r1 numbers:
  - identical plans: shuffle partitions pinned (SPARK_GRAFT_SHUFFLE),
    distributed linking forced (no driver-serial section whose cost is
    invariant to core count — Amdahl);
  - host noise: steal ticks measured per run; a run is REJECTED and
    retried when the host stole more than STEAL_LIMIT ticks during it
    (this box exhibits multi-second hypervisor freezes);
  - fixed overhead amortized: default 24k pages so UDF compute, not
    2-5 s/job scheduling constants, dominates.

Each level runs in a fresh subprocess (own JVM) via bench.py's
SPARK_GRAFT_ONLY_KG mode.  Writes BENCH/scaling_latest.json (embedded
into bench.py's output line) and appends a row to BENCH/BASELINE.md.

Usage:  python scripts/scaling_bench.py [--pages 24000] [--low 8 --high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEAL_LIMIT = int(os.environ.get("SPARK_GRAFT_STEAL_LIMIT", "3000"))


def _steal() -> int:
    return int(open("/proc/stat").readline().split()[8])


def run_level(cpus: int, pages: int, shuffle: int, max_tries: int = 3,
              pin: bool = False, adaptive: bool = False) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_ONLY_KG="1",
        SPARK_GRAFT_KG_PAGES=str(pages),
        SPARK_GRAFT_FORCE_DISTRIBUTED="0" if adaptive else "1",
        SPARK_GRAFT_SHUFFLE=str(shuffle),
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"),
    )
    last = None
    for attempt in range(1, max_tries + 1):
        s0 = _steal()
        t0 = time.time()
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if pin:
            # hard-pin the WHOLE process tree (JVM, GC/IO threads, python
            # workers) to exactly `cpus` physical cores — local[N] alone
            # only limits task slots, letting GC + python workers spill
            # onto idle cores and inflating the low level's throughput
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        steal = _steal() - s0
        line = None
        for ln in reversed(proc.stdout.strip().splitlines()):
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
                break
        if line is None:
            print(f"[cpus={cpus}] attempt {attempt}: no JSON (rc={proc.returncode})",
                  file=sys.stderr)
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            continue
        out = json.loads(line)
        out["steal_ticks"] = steal
        out["wall_sec"] = round(time.time() - t0, 1)
        last = out
        print(
            f"[cpus={cpus}] attempt {attempt}: kg={out['queries']['kg_pipeline']}s "
            f"docs/s={out['docs_per_sec']} steal={steal}"
        )
        if steal <= STEAL_LIMIT:
            return out
        print(f"[cpus={cpus}] steal {steal} > {STEAL_LIMIT}: retrying on a quieter window")
    return last  # best effort: return the final attempt, flagged by steal


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--shuffle", type=int, default=64)
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--adaptive", action="store_true",
                    help="production-default scale-adaptive linking (local "
                         "resolution under 10k entities) instead of forcing "
                         "the distributed LSH+CC path; both levels still run "
                         "the IDENTICAL plan")
    args = ap.parse_args()

    lo = run_level(args.low, args.pages, args.shuffle, pin=args.pin, adaptive=args.adaptive)
    hi = run_level(args.high, args.pages, args.shuffle, pin=args.pin, adaptive=args.adaptive)
    if not lo or not hi:
        sys.exit("scaling run failed to produce JSON at one or both levels")

    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    factor = args.high / args.low
    eff = speedup / factor
    result = {
        "pages": args.pages,
        "shuffle_partitions": args.shuffle,
        "pinned": args.pin,
        "linking": "adaptive" if args.adaptive else "forced_distributed",
        "low": {"cpus": args.low, "docs_per_sec": lo["docs_per_sec"],
                "kg_sec": lo["queries"]["kg_pipeline"], "steal_ticks": lo["steal_ticks"]},
        "high": {"cpus": args.high, "docs_per_sec": hi["docs_per_sec"],
                 "kg_sec": hi["queries"]["kg_pipeline"], "steal_ticks": hi["steal_ticks"]},
        "speedup": round(speedup, 3),
        "parallelism_factor": factor,
        "efficiency": round(eff, 3),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
