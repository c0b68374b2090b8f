"""Spark pipeline ≡ single-process oracle, byte-for-byte, plus the
BASELINE.json P/R >= 0.95 gate on emitted triples (measured against the
oracle, which is the reference-semantics port — SURVEY.md §5/§7)."""

import pytest

from hybrid_graphrag_with_qdrant_neo4j_spark import corpus, oracle
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

N_PAGES = 150
MAX_TOKENS = 60  # small enough that docs split into several chunks


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("kg"))
    pages = corpus.pages_spark_df(spark, N_PAGES, partitions=8)
    result = build_kg(
        spark, pages, out_dir, input_fingerprint=f"corpus:{N_PAGES}:42",
        max_tokens=MAX_TOKENS,
    )
    expected = oracle.oracle_tables(corpus.generate_pages(N_PAGES), max_tokens=MAX_TOKENS)
    return result, expected


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_text_extraction_byte_identical(built, spark):
    result, _ = built
    got = {r["url"]: r["text"] for r in result.tables["text"].collect()}
    for page in corpus.generate_pages(N_PAGES):
        assert got[page["url"]] == page["text"], page["url"]


def test_chunks_match_oracle(built):
    result, expected = built
    got = _rows(result.tables["chunks"], ["url", "doc_id", "chunk_id", "chunk_index", "text"])
    assert got == expected["chunks"]


def test_term_edges_match_oracle(built):
    result, expected = built
    got = _rows(result.tables["term_chunk_edges"], ["chunk_id", "term", "type"])
    assert got == expected["term_chunk_edges"]


def test_triples_match_oracle_pr(built):
    result, expected = built
    got = _rows(result.tables["triples_raw"], ["chunk_id", "subj", "pred", "obj"])
    p, r = oracle.precision_recall(got, expected["triples_raw"])
    assert p >= 0.95 and r >= 0.95, (p, r)
    # in fact identical semantics -> exact equality
    assert sorted(set(got)) == sorted(set(expected["triples_raw"]))


def test_mentions_match_oracle(built):
    result, expected = built
    got = _rows(result.tables["mentions"], ["chunk_id", "entity_name"])
    assert got == expected["mentions"]


def test_entities_canonicalization_matches_oracle(built):
    result, expected = built
    got = _rows(result.tables["entities"], ["name", "canonical_id"])
    assert got == expected["entities"]


def test_edges_match_oracle(built):
    result, expected = built
    got = _rows(result.tables["edges"], ["subj_id", "pred", "obj_id", "chunk_id", "url"])
    assert got == expected["edges"]


def test_chunk_embeddings_normalized(built):
    result, _ = built
    df = result.tables["chunk_embeddings"]
    row = df.first()
    assert len(row["embedding"]) == 768
    norm = sum(v * v for v in row["embedding"])
    assert abs(norm - 1.0) < 1e-3


def test_resume_skips_completed_stages(spark, built, tmp_path_factory):
    """North-rule resumability: a second run over the same input reads
    every snapshot back instead of recomputing."""
    result, _ = built
    assert result.resumed_stages == []  # first run computed everything
    out_dir = str(tmp_path_factory.mktemp("kg2"))
    pages = corpus.pages_spark_df(spark, 30, partitions=4)
    r1 = build_kg(spark, pages, out_dir, input_fingerprint="corpus:30:42", max_tokens=MAX_TOKENS)
    assert r1.resumed_stages == []
    r2 = build_kg(spark, pages, out_dir, input_fingerprint="corpus:30:42", max_tokens=MAX_TOKENS)
    assert set(r2.resumed_stages) == set(r1.tables.keys())
    # changing the input fingerprint invalidates everything
    r3 = build_kg(spark, pages, out_dir, input_fingerprint="corpus:30:43", max_tokens=MAX_TOKENS)
    assert r3.resumed_stages == []


def test_iceberg_probe_and_conditional_write(spark, tmp_path):
    """Iceberg stage snapshots (VERDICT r2 next-round #8): the probe must
    be clean (no raise) either way; with the runtime present the manifest
    records a snapshot id, without it the parquet path is used (what this
    sandbox exercises)."""
    import pytest as _pytest
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans import checkpoint as cp

    avail = cp.iceberg_available(spark)
    if not avail:
        assert cp.iceberg_catalog(spark) is None
        sr = cp.run_stage(
            spark, str(tmp_path), "probe_stage", "fp1",
            lambda: spark.range(5).toDF("id"),
        )
        assert sr.manifest.get("iceberg_table") is None
        assert sr.df.count() == 5
        # resume still parquet-backed
        sr2 = cp.run_stage(
            spark, str(tmp_path), "probe_stage", "fp1",
            lambda: (_ for _ in ()).throw(AssertionError("recomputed")),
        )
        assert sr2.resumed
        _pytest.skip("Iceberg runtime not on classpath — parquet path verified")
    # with jars + catalog configured: snapshot id must be recorded
    if cp.iceberg_catalog(spark) is None:
        _pytest.skip("Iceberg jars present but no catalog configured")
    sr = cp.run_stage(
        spark, str(tmp_path), "probe_stage_ice", "fp1",
        lambda: spark.range(5).toDF("id"),
    )
    assert sr.manifest.get("snapshot_id") is not None


def test_lang_partitioned_stages_prune(spark, tmp_path):
    """north_star 'language-filtered partitions': text/chunks snapshots
    are written partitioned by lang, so the en-only stages' lang filter
    lands in PartitionFilters (file pruning) instead of a row filter
    over every file."""
    import os as _os
    from pyspark.sql import functions as F
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path / "kg")
    pages = corpus.pages_spark_df(spark, 60, partitions=4)
    res = build_kg(spark, pages, out, input_fingerprint="langpart:60", max_tokens=80)

    # physical layout: lang=<v> directories exist
    chunk_dirs = _os.listdir(_os.path.join(out, "chunks", "data"))
    assert any(d.startswith("lang=en") for d in chunk_dirs), chunk_dirs

    en = spark.read.parquet(_os.path.join(out, "chunks", "data")).filter(
        F.col("lang") == "en"
    )
    plan = en._sc._jvm.PythonSQLUtils.explainString(
        en._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:300], plan[-600:]

    # row content unchanged by the layout (same counts as a fresh compute)
    assert res.tables["chunks"].count() == spark.read.parquet(
        _os.path.join(out, "chunks", "data")
    ).count()
