#!/usr/bin/env python
"""Append-vs-rebuild measurement at scale, BOTH append paths (VERDICT r4
next-round #4: the relabeling slow path — an O(table) edges/entities
rewrite gated on merged components — was only unit-scale tested; this
measures it on the same 24k+3k split the 9.9 s fast-path number used).

Three measured legs over one 24k-page base KG (copied per leg):

  fast    append 3k disjoint corpus pages — no component relabeled, the
          append-only path (existing parquet untouched, O(batch) work)
  merge   append the same 3k pages PLUS alias pages whose new entity
          surface merges into (and relabels) an existing component ->
          the slow path rewrites entities + edges tables in full
  rebuild build_kg over the concatenated 27k pages (the do-nothing
          alternative both appends are measured against)

The alias trigger reuses the pytest fixture's proven geometry: a long
shared prefix keeps cosine(alias, canonical) ~ 0.981 >= 0.96 under the
hash embedder, and the new surface sorts lexicographically FIRST so the
old component MUST relabel (tests/test_incremental.py).

Usage: python scripts/append_bench.py [--pages 24000] [--batch 3000]
       [--cpus 8] [--alias-pages 64]
Writes BENCH/append_paths_latest.json; append the row to
BENCH/BASELINE.md's append-vs-rebuild table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# proven >=0.96 alias pair (tests/test_incremental.py): batch surface
# sorts BEFORE the base surface -> the base component must relabel
ENT_BASE = "Global Amalgamated Consolidated Industries Incorporatedx"
ENT_ALIAS = "Global Amalgamated Consolidated Industries Incorporated"


def _steal() -> int:
    return int(open("/proc/stat").readline().split()[8])


def _alias_pages(spark, n, entity, start_id=0):
    """Synthetic pages whose single sentence emits a (subj, founded,
    entity) triple — enough edges on the entity's component to make the
    relabel observable in n_edges_touched."""
    rows = []
    for i in range(n):
        sent = f"Dana Fox founded {entity} in 1999."
        html = (
            "<html><head><title>t</title></head><body><p>"
            + sent + " </p></body></html>"
        ).encode()
        rows.append((f"https://alias.example/p/{start_id + i}", None, html, sent, "en"))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24000)
    ap.add_argument("--batch", type=int, default=3000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--alias-pages", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/append_bench")
    args = ap.parse_args()

    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    spark = get_spark(
        app_name="append_bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    base = os.path.join(args.workdir, "base")

    # base KG: 24k corpus pages + alias-bearing pages establishing the
    # component that the merge leg will relabel
    base_pages = corpus.pages_spark_df(spark, args.pages, partitions=args.cpus * 4)
    base_pages = base_pages.unionByName(
        _alias_pages(spark, args.alias_pages, ENT_BASE)
    )
    t0 = time.time()
    build_kg(spark, base_pages, base, input_fingerprint=f"ab:{args.pages}",
             num_partitions=args.cpus * 4)
    base_build_sec = round(time.time() - t0, 2)
    n_edges_base = spark.read.parquet(os.path.join(base, "edges", "data")).count()

    batch = corpus.pages_spark_df(
        spark, args.batch, partitions=args.cpus * 4, start=args.pages
    )
    out = {
        "pages_base": args.pages, "pages_batch": args.batch,
        "cpus": args.cpus, "alias_pages": args.alias_pages,
        "n_edges_base": n_edges_base, "base_build_sec": base_build_sec,
    }

    # ---- fast path: disjoint batch, nothing relabels ------------------
    fast_dir = os.path.join(args.workdir, "fast")
    shutil.copytree(base, fast_dir)
    s0, t0 = _steal(), time.time()
    stats = append_batch(spark, fast_dir, batch, batch_id="fast")
    out["fast"] = {
        "wall_sec": round(time.time() - t0, 2),
        "steal_ticks": _steal() - s0,
        "n_relabeled_components": stats["n_relabeled_components"],
        "n_edges_touched": stats["n_edges_touched"],
        "n_edges_appended": stats["n_edges_appended"],
    }
    assert stats["n_relabeled_components"] == 0, "fast leg unexpectedly relabeled"

    # ---- merge (slow) path: alias batch forces a relabel --------------
    merge_dir = os.path.join(args.workdir, "merge")
    shutil.copytree(base, merge_dir)
    merge_batch = batch.unionByName(
        _alias_pages(spark, 8, ENT_ALIAS, start_id=10_000)
    )
    s0, t0 = _steal(), time.time()
    stats = append_batch(spark, merge_dir, merge_batch, batch_id="merge")
    n_edges_after = spark.read.parquet(
        os.path.join(merge_dir, "edges", "data")
    ).count()
    out["merge"] = {
        "wall_sec": round(time.time() - t0, 2),
        "steal_ticks": _steal() - s0,
        "n_relabeled_components": stats["n_relabeled_components"],
        "n_edges_touched": stats["n_edges_touched"],
        "n_edges_appended": stats["n_edges_appended"],
        "n_edges_rewritten_table": n_edges_after,
    }
    assert stats["n_relabeled_components"] >= 1, "merge leg did not relabel"

    # ---- replace path: half the batch re-fetches EXISTING urls with
    # CHANGED content (different corpus seed, same ids -> same urls),
    # on_changed='replace' purges + re-ingests them and runs the exact
    # entity-graph GC — the heaviest append shape (6 doc-scoped table
    # rewrites + ANN vector purge + entities/edges/pairs rebuild)
    replace_dir = os.path.join(args.workdir, "replace")
    shutil.copytree(base, replace_dir)
    replace_batch = corpus.pages_spark_df(
        spark, args.batch, partitions=args.cpus * 4,
        start=args.pages - args.batch // 2, seed=99,
    )
    s0, t0 = _steal(), time.time()
    stats = append_batch(
        spark, replace_dir, replace_batch, batch_id="replace",
        on_changed="replace",
    )
    out["replace"] = {
        "wall_sec": round(time.time() - t0, 2),
        "steal_ticks": _steal() - s0,
        "n_docs_replaced": stats["n_docs_replaced"],
        "n_pages_ingested": stats["n_pages"],
        "entity_gc": stats["entity_gc"],
    }
    assert stats["n_docs_replaced"] > 0, "replace leg found nothing changed"

    # ---- rebuild baseline --------------------------------------------
    full_dir = os.path.join(args.workdir, "full")
    s0, t0 = _steal(), time.time()
    build_kg(
        spark, base_pages.unionByName(batch), full_dir,
        input_fingerprint=f"ab:{args.pages + args.batch}",
        num_partitions=args.cpus * 4,
    )
    out["rebuild"] = {
        "wall_sec": round(time.time() - t0, 2),
        "steal_ticks": _steal() - s0,
    }

    dest = os.path.join(REPO, "BENCH", "append_paths_latest.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
