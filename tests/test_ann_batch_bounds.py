"""Round-5 hardening of the indexed batch ANN operators and the
incremental append path (VERDICT r4 'what's wrong' #1, ADVICE r4):

  - max_queries_per_pass chunk-and-union: a query batch larger than the
    cap splits into bounded passes with per-pass probe pruning, and the
    multi-pass result is IDENTICAL to one unbounded pass and to N
    single-query calls;
  - id dtype preservation: the batch twins keep the input id column's
    atomic type, so boundary-score ties break under the same
    (score desc, id asc) order as the single-query operators
    (previously '10' < '2' lexicographic on stringified ids);
  - append_batch on a batch that fully dedups away (every URL already
    ingested) must not touch the ANN index — the LSH dim inference on
    an empty DataFrame raised and wedged the streaming checkpoint
    retry loop (ADVICE r4 medium).
"""

import os

from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark.operators import ann_index


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_ivf_batch_bounded_passes_equal_unbounded(spark, tmp_path):
    """cap=2 with 5 queries -> 3 passes; result set identical to the
    single-pass run and to per-query ivf_index_topk calls."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivfb")
    cents = ann_index.write_ivf_index(emb, idx, k=8, lloyd_iters=1)
    qvecs = [
        (f"q{vid}", [float(v) for v in emb.filter(F.col("vec_id") == vid).first()["embedding"]])
        for vid in (0, 3, 7, 11, 42)
    ]
    unbounded = ann_index.ivf_index_topk_many(
        spark, idx, qvecs, top_k=6, n_probe=2, centroids=cents
    )
    bounded = ann_index.ivf_index_topk_many(
        spark, idx, qvecs, top_k=6, n_probe=2, centroids=cents,
        max_queries_per_pass=2,
    )
    assert _rows(bounded) == _rows(unbounded) and bounded.count() > 0
    singles = set()
    for qid, qv in qvecs:
        one = ann_index.ivf_index_topk(
            spark, idx, qv, top_k=6, n_probe=2, centroids=cents
        )
        singles |= {(qid, r["vec_id"], r["score"]) for r in one.collect()}
    assert _rows(bounded) == singles


def test_lsh_batch_bounded_passes_equal_unbounded(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "lshb")
    ann_index.write_lsh_index(emb, idx, bits=8, n_tables=2)
    qvecs = [
        (f"q{vid}", [float(v) for v in emb.filter(F.col("vec_id") == vid).first()["embedding"]])
        for vid in (0, 3, 7, 11, 42)
    ]
    kw = dict(top_k=6, bits=8, n_tables=2, hamming_radius=1)
    unbounded = ann_index.lsh_index_topk_many(spark, idx, qvecs, **kw)
    bounded = ann_index.lsh_index_topk_many(
        spark, idx, qvecs, max_queries_per_pass=2, **kw
    )
    assert _rows(bounded) == _rows(unbounded) and bounded.count() > 0


def test_batch_ann_numeric_id_ties_match_single_query(spark, tmp_path):
    """Ids 3 and 20 share an identical embedding; with top_k=1 the
    single-query operator picks 3 (numeric asc).  The stringified-id
    contract picked 20 ('20' < '3'); the dtype-preserving batch twin
    must agree with the single-query order."""
    rows = [
        (3, [1.0, 0.0, 0.0, 0.0]),
        (20, [1.0, 0.0, 0.0, 0.0]),   # exact duplicate of id 3
        (5, [0.0, 1.0, 0.0, 0.0]),
        (6, [0.0, 0.0, 1.0, 0.0]),
        (7, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]

    ivf = str(tmp_path / "ivft")
    cents = ann_index.write_ivf_index(emb, ivf, k=2, lloyd_iters=1)
    one = ann_index.ivf_index_topk(
        spark, ivf, q, top_k=1, n_probe=2, centroids=cents
    ).collect()
    many = ann_index.ivf_index_topk_many(
        spark, ivf, [("q", q)], top_k=1, n_probe=2, centroids=cents
    )
    assert many.schema["vec_id"].dataType.simpleString() == "bigint"
    mrows = many.collect()
    assert [(r["vec_id"], r["score"]) for r in mrows] == [
        (r["vec_id"], r["score"]) for r in one
    ]
    assert mrows[0]["vec_id"] == 3  # numeric tie-break, not '20' < '3'

    lsh = str(tmp_path / "lsht")
    ann_index.write_lsh_index(emb, lsh, bits=4, n_tables=2)
    lone = ann_index.lsh_index_topk(
        spark, lsh, q, top_k=1, bits=4, n_tables=2, hamming_radius=1
    ).collect()
    lmany = ann_index.lsh_index_topk_many(
        spark, lsh, [("q", q)], top_k=1, bits=4, n_tables=2, hamming_radius=1
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in lmany] == [
        (r["vec_id"], r["score"]) for r in lone
    ]
    assert lmany[0]["vec_id"] == 3


def test_append_batch_empty_after_dedup_skips_ann_index(spark, tmp_path):
    """Re-appending already-ingested URLs leaves zero surviving chunks;
    the ANN maintenance step must be skipped (not raise on empty-input
    dim inference) so a streaming retry cannot wedge (ADVICE r4)."""
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    kg = str(tmp_path / "kg")
    pages = corpus.pages_spark_df(spark, 30, partitions=2)
    build_kg(spark, pages, kg, input_fingerprint="t:emptyb",
             num_partitions=2, ann_index="lsh", ann_bits=4, ann_tables=2)
    before = spark.read.parquet(os.path.join(kg, "ann_index", "vectors")).count()

    # same 30 pages again: URL dedup drops every row
    stats = append_batch(spark, kg, pages, batch_id="redeliver-1", num_partitions=2)
    assert stats["n_pages"] == 0 and stats["n_chunks"] == 0
    assert stats["ann_index_appended"] is False
    after = spark.read.parquet(os.path.join(kg, "ann_index", "vectors")).count()
    assert after == before
