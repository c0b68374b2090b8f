#!/usr/bin/env python
"""spark-submit entry point for the KG construction pipeline.

Usage (the north-rule deployment shape):

    zip -r /tmp/hgqn_spark.zip hybrid_graphrag_with_qdrant_neo4j_spark
    spark-submit --master local[32] --py-files /tmp/hgqn_spark.zip \
        run_pipeline.py --out /data/kg --pages 10000 [--input PARQUET_DIR]

Reads pages from ``--input`` (parquet with the input_hint schema:
url, warc_ts, html, text, lang) or generates the deterministic synthetic
corpus with ``--pages N``.  Resumable: rerunning with the same --out and
input fingerprint skips completed stages (plans.checkpoint manifests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output/checkpoint directory")
    ap.add_argument("--input", help="parquet dir of pages (input_hint schema)")
    ap.add_argument("--pages", type=int, default=1000, help="synthetic corpus size")
    ap.add_argument("--max-tokens", type=int, default=200)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    spark = get_spark(app_name="kg_build")
    cpus = spark.sparkContext.defaultParallelism
    partitions = args.partitions or cpus

    if args.input:
        pages = spark.read.parquet(args.input)
        # fingerprint from input CONTENT metadata, not the path: an
        # in-place rewrite of the parquet must invalidate the resume
        # snapshots (ADVICE r1)
        import hashlib

        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(args.input)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        fingerprint = f"input:{args.input}:{h.hexdigest()[:16]}"
    else:
        pages = corpus.pages_spark_df(
            spark, args.pages, seed=args.seed, partitions=partitions
        )
        fingerprint = f"corpus:{args.pages}:{args.seed}"

    t0 = time.perf_counter()
    result = build_kg(
        spark,
        pages,
        args.out,
        input_fingerprint=fingerprint,
        max_tokens=args.max_tokens,
        num_partitions=partitions,
    )
    elapsed = time.perf_counter() - t0
    summary = {
        "elapsed_sec": round(elapsed, 2),
        "resumed_stages": sorted(result.resumed_stages),
        "tables": {k: v.count() for k, v in result.tables.items()},
        "partitions": partitions,
    }
    print(json.dumps(summary, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
