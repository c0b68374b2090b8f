"""Row-level revision handling (round 5): ``append_batch(on_changed=
'replace')`` deletes a changed doc's rows from every doc-scoped table
(+ its ANN vectors), re-ingests the fresh content, and repairs the
entity graph EXACTLY via ``gc_entities`` — the result must be SET-EQUAL
to a full rebuild over the revised corpus, including the two effects no
incremental relabel can express: entities orphaned by the revision
disappear, and components the old content bridged SPLIT.

The reference re-runs its whole per-file pipeline on re-ingest and has
no revision story (cli/main.py:115-156); Iceberg row-level MERGE is the
production form of the same statement (see incremental.py docstrings).
"""

import os

import pytest
from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark.plans.checkpoint import load_manifest
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

_BASE = "Global Amalgamated Consolidated Industries Incorporated"
# chain under the hash embedder (driver-measured cosines):
#   lower(N1) ~ lower(N2) = 0.975, lower(N2) ~ lower(N3) = 0.9637  (>= 0.96)
#   lower(N1) ~ lower(N3) = 0.9515                                  (< 0.96)
# so N2 BRIDGES N1 and N3: remove N2 and the component must split
_N1 = _BASE + "xq"
_N2 = _BASE
_N3 = _BASE + "abcd"


def _page(i, sentence):
    html = (
        "<html><head><title>t</title></head><body><p>"
        + sentence
        + " </p></body></html>"
    ).encode()
    return (f"https://rev.example/p/{i}", None, html, sentence, "en")


def _pages_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _table_sets(spark, kg_dir):
    ents = {
        (r["name"], r["canonical_id"])
        for r in spark.read.parquet(f"{kg_dir}/entities/data").collect()
    }
    edges = {
        (r["subj_id"], r["pred"], r["obj_id"], r["chunk_id"])
        for r in spark.read.parquet(f"{kg_dir}/edges/data").collect()
    }
    return ents, edges


def _doc_sets(spark, kg_dir):
    text = {
        (r["url"], r["text"])
        for r in spark.read.parquet(f"{kg_dir}/text/data").collect()
    }
    chunks = {
        (r["chunk_id"], r["text"])
        for r in spark.read.parquet(f"{kg_dir}/chunks/data").collect()
    }
    return text, chunks


def test_replace_changed_doc_equals_rebuild(spark, tmp_path):
    p0_v1 = _page(0, f"Dana Fox founded {_N2} in 1999.")
    p1 = _page(1, f"{_N2} partnered with Acme Corporation on a joint venture.")
    p2 = _page(2, "Erin Cole founded Globex Systems in 1999.")
    p0_v2 = _page(0, "Initech Group partnered with Vandelay Industries on a joint venture.")
    p20 = _page(20, "Wendy Mak founded Hooli Systems in 1999.")

    inc = str(tmp_path / "inc")
    build_kg(spark, _pages_df(spark, [p0_v1, p1, p2]), inc,
             input_fingerprint="v1", ann_index="ivf", ann_k=4)

    stats = append_batch(
        spark, inc, _pages_df(spark, [p0_v2, p20]),
        batch_id="rev1", on_changed="replace",
    )
    assert stats["n_urls_changed"] == 1
    assert stats["n_docs_replaced"] == 1
    assert stats["entity_gc"]["n_entities"] > 0
    # incremental-relabel stats are superseded by the wholesale repair
    assert stats["n_relabeled_components"] is None

    full = str(tmp_path / "full")
    build_kg(spark, _pages_df(spark, [p0_v2, p1, p2, p20]), full,
             input_fingerprint="v2")
    assert _table_sets(spark, inc) == _table_sets(spark, full)
    assert _doc_sets(spark, inc) == _doc_sets(spark, full)

    # the ANN index holds exactly the live chunks' vectors — the old
    # revision's vectors are purged, the new revision's appended
    vec_ids = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{inc}/ann_index/vectors")
        .select("chunk_id").collect()
    }
    chunk_ids = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{inc}/chunks/data").select("chunk_id").collect()
    }
    assert vec_ids == chunk_ids

    # every stage manifest's n_rows survives the purge+gc arithmetic
    for stage in ["text", "chunks", "chunk_embeddings", "term_chunk_edges",
                  "triples_raw", "mentions", "entity_pairs", "entities", "edges"]:
        data = os.path.join(inc, stage, "data")
        if not os.path.isdir(data):
            continue
        man = load_manifest(inc, stage)
        assert man["n_rows"] == spark.read.parquet(data).count(), stage

    # replay of the same batch id is a no-op
    again = append_batch(
        spark, inc, _pages_df(spark, [p0_v2, p20]),
        batch_id="rev1", on_changed="replace",
    )
    assert again.get("skipped") is True


def test_replace_orphan_and_component_split_equals_rebuild(spark, tmp_path):
    """The hard case: the replaced doc held the ONLY mention of the
    bridge entity N2, whose similarity links N1—N2—N3 merged all three
    into one component.  After the revision removes N2, a rebuild keeps
    N1 and N3 in SEPARATE components (their direct cosine is below the
    threshold) — the GC must reproduce that split exactly."""
    pa = _page(0, f"Dana Fox founded {_N1} in 1999.")
    pb = _page(1, f"{_N2} partnered with Acme Corporation on a joint venture.")
    pc = _page(2, f"Erin Cole founded {_N3} in 1999.")
    pb_v2 = _page(1, "Initech Group partnered with Hooli Systems on a joint venture.")

    inc = str(tmp_path / "inc")
    build_kg(spark, _pages_df(spark, [pa, pb, pc]), inc, input_fingerprint="v1")

    ents0 = dict(
        (r["name"], r["canonical_id"])
        for r in spark.read.parquet(f"{inc}/entities/data").collect()
    )
    n1, n2, n3 = _N1.lower(), _N2.lower(), _N3.lower()
    # the bridge merges the whole chain initially (canonical = min = N2)
    assert ents0[n1] == ents0[n2] == ents0[n3] == n2

    stats = append_batch(
        spark, inc, _pages_df(spark, [pb_v2]),
        batch_id="rev-split", on_changed="replace",
    )
    assert stats["n_docs_replaced"] == 1

    full = str(tmp_path / "full")
    build_kg(spark, _pages_df(spark, [pa, pb_v2, pc]), full, input_fingerprint="v2")
    assert _table_sets(spark, inc) == _table_sets(spark, full)

    ents1 = dict(
        (r["name"], r["canonical_id"])
        for r in spark.read.parquet(f"{inc}/entities/data").collect()
    )
    assert n2 not in ents1  # orphaned by the revision
    assert ents1[n1] != ents1[n3]  # the component split
    # pairs touching the orphaned name left the ledger
    pairs = spark.read.parquet(f"{inc}/entity_pairs/data")
    assert pairs.filter(
        (F.col("name_a") == n2) | (F.col("name_b") == n2)
    ).count() == 0


def test_replace_requires_dedup(spark, tmp_path):
    with pytest.raises(ValueError):
        append_batch(
            spark, str(tmp_path / "kg"), _pages_df(spark, [_page(0, "x.")]),
            batch_id="b", dedup_urls=False, on_changed="replace",
        )
    with pytest.raises(ValueError):
        append_batch(
            spark, str(tmp_path / "kg"), _pages_df(spark, [_page(0, "x.")]),
            batch_id="b", on_changed="never_heard_of_it",
        )
