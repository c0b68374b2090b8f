#!/usr/bin/env python
"""Scaling evidence for the graph-analytics operators (round-5
continuation): PageRank / label propagation / k-hop BFS / batch
personalized PageRank over a deterministic synthetic graph, run at two
pinned parallelism levels on the SAME input (the sandbox form of the
north rule's two-cluster-size criterion, like scripts/scaling_bench.py
does for KG construction).

The graph is generated Spark-side (no driver materialization): edge i
has src = xxhash64(i) mod N and a skew-concentrated dst (quadratic map
of a second hash onto node ids), giving the hub-heavy in-degree shape a
crawl-derived entity graph has.  Everything is deterministic — no RNG,
no clock — so both levels and any re-run see byte-identical input.

Usage:
  python scripts/analytics_bench.py --inner --cpus 8 --edges 2000000
      one pinned level, prints one JSON line
  python scripts/analytics_bench.py --edges 2000000 --low 8 --high 32
      both levels in fresh subprocesses (own JVMs), taskset-pinned,
      steal-measured; appends the result to BENCH/analytics_scaling.json
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


def _inner(cpus: int, n_edges: int, n_nodes: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession, functions as F

    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
        graph_analytics as ga,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("analytics_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic hub-skewed digraph, built JVM-side
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
    frac = (h2 % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)
    edges = (
        spark.range(n_edges)
        .select(
            (h1 % F.lit(n_nodes)).cast("string").alias("subj_id"),
            F.lit("R").alias("pred"),
            F.floor(F.lit(float(n_nodes)) * frac * frac)
            .cast("string")
            .alias("obj_id"),
            F.col("id").cast("string").alias("chunk_id"),
            F.lit("u").alias("url"),
        )
        .persist()
    )
    edges.count()  # materialize input outside the timed sections

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    pr = ga.pagerank(edges, iterations=5)
    n_pr = pr.count()
    timings["pagerank_5it_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    lp = ga.label_propagation(edges, iterations=5)
    n_comm = lp.select("label").distinct().count()
    timings["lpa_5it_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    kh = ga.khop_neighbors(edges, ["0"], k=3)
    n_kh = kh.count()
    timings["khop3_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    seeds = spark.createDataFrame(
        [(f"q{i}", str(i * 97 % n_nodes)) for i in range(32)],
        "query_id string, entity_id string",
    )
    pm = ga.personalized_pagerank_many(edges, seeds, iterations=5)
    n_ppr = pm.count()
    timings["ppr_many32_5it_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ht = ga.hits(edges, iterations=5)
    n_hits = ht.count()
    timings["hits_5it_sec"] = round(time.perf_counter() - t0, 2)

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_edges": n_edges,
                "n_nodes": n_nodes,
                **timings,
                "total_sec": total,
                "edges_per_sec": round(
                    # 5+5+5 rank iterations + 3 hops + 5 HITS iterations
                    # at 2 edge-passes each = 28 edge-scan equivalents
                    n_edges * 28 / total
                ),
                "checks": {
                    "pagerank_rows": n_pr,
                    "communities": n_comm,
                    "khop_rows": n_kh,
                    "ppr_rows": n_ppr,
                    "hits_rows": n_hits,
                },
            }
        )
    )
    spark.stop()


def run_level(cpus: int, n_edges: int, n_nodes: int, max_tries: int = 3) -> dict:
    last = None
    for attempt in range(1, max_tries + 1):
        s0 = _steal()
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--inner", "--cpus", str(cpus),
            "--edges", str(n_edges), "--nodes", str(n_nodes),
        ]
        out_txt = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO
        ).stdout.strip().splitlines()
        steal = _steal() - s0
        out = json.loads(out_txt[-1])
        out["steal_ticks"] = steal
        last = out
        print(f"[cpus={cpus}] total={out['total_sec']}s "
              f"edges/s={out['edges_per_sec']} steal={steal}", file=sys.stderr)
        if steal <= STEAL_LIMIT:
            return out
        print(f"[cpus={cpus}] steal {steal} > {STEAL_LIMIT}: retrying",
              file=sys.stderr)
    return last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    if args.inner:
        _inner(args.cpus, args.edges, args.nodes)
        return

    lo = run_level(args.low, args.edges, args.nodes)
    hi = run_level(args.high, args.edges, args.nodes)
    # identical input + identical plan => same result cardinalities
    assert lo["checks"] == hi["checks"], (lo["checks"], hi["checks"])
    speedup = lo["total_sec"] / hi["total_sec"]
    eff = speedup / (args.high / args.low)
    result = {
        "job": "graph_analytics(pagerank5+lpa5+khop3+ppr_many32x5+hits5)",
        "n_edges": args.edges,
        "n_nodes": args.nodes,
        "low": {k: lo[k] for k in lo if k != "checks"},
        "high": {k: hi[k] for k in hi if k != "checks"},
        "checks": lo["checks"],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "analytics_scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
