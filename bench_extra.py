#!/usr/bin/env python
"""Per-query isolation harness for the optimization round (guide §1).

bench.py is FROZEN for measurement; this sidecar produces the evidence
OPTIMIZATION_r06.md cites:

  * per-headline-query timing, min-of-REPS, noop sink (guide §1.4)
  * `.explain("formatted")` captured to plans/r06/<query>_<tag>.txt
  * phase breakdown for the composite entries (kg_pipeline, webgraph,
    kg_ann_index_build_once) so optimization targets the right stage

Usage:
  python bench_extra.py [--queries a,b,c] [--tag before|after]
                        [--explain-only] [--phases]
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_REPS as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "order_rank_per_customer", "doc_unigram_counts", "term_search_docs",
    "quality_scores", "exact_dedup_docs", "knn_topk", "ann_lsh_topk",
    "ann_ivf_topk", "ann_ivf_indexed_topk", "ann_ivf_index_many_topk",
    "term_search_many_docs", "cosine_dup_pairs", "minhash_near_dups",
    "simhash_fingerprints", "daily_event_counts", "user_sessions",
    "trend_impact", "hybrid_fusion_docs", "context_window_docs",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import (
        get_spark, warm_python_workers,
    )

    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(CPUS)))
    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=shuffle,
    )
    queries = entry_mod.queries()
    warm_python_workers(spark)
    for tbl in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{tbl}.parquet")).count()

    os.makedirs(PLAN_DIR, exist_ok=True)
    names = args.queries.split(",") if args.queries else HEADLINE
    out: dict[str, object] = {}

    def _steal() -> int:
        return int(open("/proc/stat").readline().split()[8])

    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = queries[name](spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        if args.explain_only:
            continue
        reps = []
        s0 = _steal()
        for _ in range(REPS):
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps, "steal": _steal() - s0}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    if args.phases:
        phases = _run_phases(spark)
        out["_phases"] = phases
        print(f"phases: {phases}", file=sys.stderr, flush=True)

    spark.stop()
    time.sleep(1.0)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "tag": args.tag, "timings": out}))
    os._exit(0)


def _run_phases(spark) -> dict:
    """Break the composite bench entries into phases (once each)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.functions import embedding as E
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
        ann_index, chunker,
    )
    from hybrid_graphrag_with_qdrant_neo4j_spark.sources import pages as pages_src

    KG_PAGES = int(os.environ.get("SPARK_GRAFT_KG_PAGES", "3000"))
    prof: dict[str, float] = {}

    # ---- ann index build phases (mirrors bench.py's timed region) ----
    idx_tmp = tempfile.mkdtemp(prefix="bx_ann_")
    try:
        t0 = time.perf_counter()
        pages = corpus.pages_spark_df(spark, KG_PAGES, partitions=max(CPUS, 8))
        chunks = chunker.chunk_documents(
            pages_src.with_doc_id(pages_src.with_extracted_text(pages)),
            max_tokens=200,
        )
        emb = chunks.select(
            F.col("chunk_id").alias("vec_id"),
            E.embed(F.col("text"), prefix="passage: ").alias("embedding"),
        ).persist()
        n = emb.count()
        prof["ann_embed_chunks"] = round(time.perf_counter() - t0, 3)
        prof["ann_n_chunks"] = n
        t1 = time.perf_counter()
        from hybrid_graphrag_with_qdrant_neo4j_spark.operators import similarity as S

        cents = S.ivf_train_centroids(emb, k=64, lloyd_iters=2)
        prof["ann_train_quantizer"] = round(time.perf_counter() - t1, 3)
        t2 = time.perf_counter()
        ann_index.write_ivf_index(
            emb, os.path.join(idx_tmp, "ivf"), centroids=cents
        )
        prof["ann_write_index"] = round(time.perf_counter() - t2, 3)
        emb.unpersist()
    finally:
        shutil.rmtree(idx_tmp, ignore_errors=True)

    return prof


if __name__ == "__main__":
    main()
