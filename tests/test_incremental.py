"""Incremental KG maintenance (VERDICT r3 next-round #5): a second page
batch appends through incremental entity linking — CC runs only on the
contracted (new names + touched canonicals) graph, the edges table is
remapped only for touched components, and the final tables are SET-EQUAL
to a full rebuild over the concatenated pages."""

import os

import pytest
from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg


# the long shared prefix keeps cosine(alias, canonical) = 0.981 >= 0.96
# under the hash embedder; the batch-2 surface sorts lexicographically
# BEFORE batch 1's, so the merge must RELABEL batch 1's component and
# rewrite its existing edges (the hard case; an alias sorting after the
# old canonical leaves old edges untouched)
_ENT_OLD = "Global Amalgamated Consolidated Industries Incorporatedx"
_ENT_NEW = "Global Amalgamated Consolidated Industries Incorporated"


def _page(i, sentence):
    html = (
        "<html><head><title>t</title></head><body><p>"
        + sentence
        + " </p></body></html>"
    ).encode()
    return (f"https://inc.example/p/{i}", None, html, sentence, "en")


def _pages_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def batches(spark):
    batch1 = _pages_df(spark, [
        _page(0, f"Dana Fox founded {_ENT_OLD} in 1999."),
        _page(1, f"{_ENT_OLD} partnered with Acme Corporation on a joint venture."),
        _page(2, "Erin Cole founded Globex Systems in 1999."),
    ])
    batch2 = _pages_df(spark, [
        _page(10, f"Dana Fox founded {_ENT_NEW} in 1999."),
        _page(11, "Globex Systems partnered with Initech Group on a joint venture."),
    ])
    return batch1, batch2


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


def test_append_batch_equals_full_rebuild(spark, tmp_path, batches):
    batch1, batch2 = batches
    inc_dir = str(tmp_path / "inc")
    build_kg(spark, batch1, inc_dir, input_fingerprint="b1", ann_index="ivf", ann_k=4)
    n_vec_before = spark.read.parquet(f"{inc_dir}/ann_index/vectors").count()

    stats = append_batch(spark, inc_dir, batch2, batch_id="b2")

    # the alias merged INTO batch 2's lexicographically-smaller surface:
    # exactly one old component relabeled, its existing edges rewritten
    assert stats["n_new_entities"] >= 1
    assert stats["n_relabeled_components"] == 1
    assert stats["n_edges_touched"] >= 1
    assert stats["ann_index_appended"] is True

    # ground truth: full rebuild over the concatenated pages
    full_dir = str(tmp_path / "full")
    build_kg(
        spark, batch1.unionByName(batch2), full_dir, input_fingerprint="b12"
    )
    want_ents, want_edges = _table_sets(spark, full_dir)
    got_ents, got_edges = _table_sets(spark, inc_dir)
    assert got_ents == want_ents
    assert got_edges == want_edges

    # the merged entity canonicalizes to the batch-2 surface everywhere
    low_new = _ENT_NEW.lower()
    low_old = _ENT_OLD.lower()
    assert (low_old, low_new) in got_ents and (low_new, low_new) in got_ents
    assert not any(s == low_old or o == low_old for s, _, o, _ in got_edges)

    # untouched component (erin cole/globex) survived byte-identical
    assert any(s == "erin cole" for s, _, _, _ in got_edges)

    # ANN index grew by the batch's chunks and answers over both batches
    n_vec_after = spark.read.parquet(f"{inc_dir}/ann_index/vectors").count()
    assert n_vec_after == n_vec_before + stats["n_chunks"]
    rag = GraphRAG(spark, inc_dir, n_probe=4)
    hits = rag.vector_chunks("Initech Group joint venture", top_k=5).collect()
    assert hits


def test_append_noop_batch_keeps_tables(spark, tmp_path, batches):
    """A batch introducing no new entities leaves entities unchanged and
    only appends its own edges."""
    batch1, _ = batches
    kg = str(tmp_path / "noop")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    ents_before, edges_before = _table_sets(spark, kg)
    repeat = _pages_df(
        spark, [_page(20, "Erin Cole founded Globex Systems in 1999.")]
    )
    def _files(stage):
        d = f"{kg}/{stage}/data"
        return {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _dirs, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        }

    ents_files_before = _files("entities")
    edges_files_before = _files("edges")
    stats = append_batch(spark, kg, repeat, batch_id="rep")
    assert stats["n_new_entities"] == 0
    assert stats["n_relabeled_components"] == 0
    assert stats["n_edges_touched"] == 0
    ents_after, edges_after = _table_sets(spark, kg)
    assert ents_after == ents_before
    assert edges_before <= edges_after
    assert len(edges_after) == len(edges_before) + stats["n_edges_appended"]
    # fast path is APPEND-ONLY: every pre-existing entities/edges file
    # survives byte-untouched (no O(table) rewrite for an O(batch) job)
    assert _files("entities") == ents_files_before
    edges_files_after = _files("edges")
    for path, mtime in edges_files_before.items():
        assert edges_files_after.get(path) == mtime, f"rewritten: {path}"
    assert len(edges_files_after) > len(edges_files_before)


def test_append_invalidates_stage_fingerprints(spark, tmp_path, batches):
    """After an append, a resume-with-original-fingerprint must NOT reuse
    the diverged snapshots (manifest fingerprints are bumped)."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.checkpoint import load_manifest

    batch1, batch2 = batches
    kg = str(tmp_path / "fp")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    fp_before = load_manifest(kg, "edges")["fingerprint"]
    append_batch(spark, kg, batch2, batch_id="b2")
    man = load_manifest(kg, "edges")
    # hash-chained (bounded per batch), diverged from the build chain
    assert man["fingerprint"] != fp_before
    assert man["fingerprint"].endswith("+appended")
    assert man["n_batches"] == 1 and man["last_batch_id"] == "b2"
    # a second batch chains again without growing the string
    append_batch(spark, kg, batch2.limit(0), batch_id="b3")
    man2 = load_manifest(kg, "edges")
    assert man2["fingerprint"] != man["fingerprint"]
    assert len(man2["fingerprint"]) == len(man["fingerprint"])
    assert man2["n_batches"] == 2


def test_batch_id_prefix_is_not_treated_as_applied(spark, tmp_path, batches):
    """Round-4 review data-loss finding: 'b1' is a prefix of 'b12' — an
    exact-membership ledger must NOT skip a never-applied batch whose id
    prefixes an applied one."""
    batch1, batch2 = batches
    kg = str(tmp_path / "pfx")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    append_batch(spark, kg, batch2, batch_id="stream:12")
    _, edges_mid = _table_sets(spark, kg)
    extra = _pages_df(
        spark, [_page(40, "Initech Group partnered with Umbrella Works on a joint venture.")]
    )
    stats = append_batch(spark, kg, extra, batch_id="stream:1")
    assert stats.get("skipped") is not True, "prefix id wrongly treated as applied"
    assert stats["n_edges_appended"] >= 1
    _, edges_after = _table_sets(spark, kg)
    assert len(edges_after) > len(edges_mid)
    # and the genuinely-applied id IS skipped
    assert append_batch(spark, kg, extra, batch_id="stream:1") == {
        "skipped": True, "batch_id": "stream:1",
    }


def test_streaming_kg_ingest_two_batches(spark, tmp_path, batches):
    """Full-KG streaming maintenance: two micro-batches through
    start_incremental_kg_ingest (cold-start bootstrap on batch 1,
    incremental linking + touched-component remap on batch 2) produce
    entities/edges set-equal to a full rebuild over both batches."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.streaming import ingest as sti

    batch1, batch2 = batches
    in_dir = str(tmp_path / "in")
    kg_dir = str(tmp_path / "skg")
    ckpt = str(tmp_path / "ckpt")

    batch1.write.mode("append").parquet(in_dir)
    q = sti.start_incremental_kg_ingest(spark, in_dir, kg_dir, ckpt)
    q.awaitTermination(300)
    ents_mid, _ = _table_sets(spark, kg_dir)
    assert ("global amalgamated consolidated industries incorporatedx",
            "global amalgamated consolidated industries incorporatedx") in ents_mid

    batch2.write.mode("append").parquet(in_dir)
    q = sti.start_incremental_kg_ingest(spark, in_dir, kg_dir, ckpt)
    q.awaitTermination(300)

    full_dir = str(tmp_path / "sfull")
    build_kg(spark, batch1.unionByName(batch2), full_dir, input_fingerprint="s12")
    want_ents, want_edges = _table_sets(spark, full_dir)
    got_ents, got_edges = _table_sets(spark, kg_dir)
    assert got_ents == want_ents
    assert got_edges == want_edges


def test_compact_tables_after_appends(spark, tmp_path, batches):
    """Operational small-file compaction: appends leave one file per
    (batch x partition); compact_tables collapses them with unchanged
    content, preserving the lang partition layout."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import (
        compact_tables,
    )

    batch1, batch2 = batches
    kg = str(tmp_path / "cmp")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    append_batch(spark, kg, batch2, batch_id="b2")
    ents_before, edges_before = _table_sets(spark, kg)
    n_chunks = spark.read.parquet(f"{kg}/chunks/data").count()

    stats = compact_tables(spark, kg, target_partitions=1)
    assert stats["chunks"]["files_after"] < stats["chunks"]["files_before"]
    assert stats["edges"]["files_after"] <= stats["edges"]["files_before"]
    # content unchanged
    ents_after, edges_after = _table_sets(spark, kg)
    assert ents_after == ents_before and edges_after == edges_before
    assert spark.read.parquet(f"{kg}/chunks/data").count() == n_chunks
    # lang layout preserved (partition pruning still works)
    pruned = spark.read.parquet(f"{kg}/chunks/data").filter(F.col("lang") == "en")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]


def test_append_batch_is_idempotent_per_batch_id(spark, tmp_path, batches):
    """A replayed batch_id (streaming re-delivery / re-run CLI append)
    is a no-op: the edges manifest's fingerprint chain records applied
    batches."""
    batch1, batch2 = batches
    kg = str(tmp_path / "idem")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    append_batch(spark, kg, batch2, batch_id="b2")
    ents1, edges1 = _table_sets(spark, kg)
    out = append_batch(spark, kg, batch2, batch_id="b2")
    assert out == {"skipped": True, "batch_id": "b2"}
    assert _table_sets(spark, kg) == (ents1, edges1)
    # a NEW batch id still applies
    stats = append_batch(spark, kg, batch2.limit(0), batch_id="b3")
    assert stats.get("skipped") is not True


def test_append_batch_maintains_lsh_index(spark, tmp_path, batches):
    """An LSH-indexed KG receives the batch's vectors through the
    seeded-plane append path (family dispatch on the ann manifest)."""
    batch1, batch2 = batches
    kg = str(tmp_path / "lsha")
    build_kg(spark, batch1, kg, input_fingerprint="b1", ann_index="lsh")
    n_before = spark.read.parquet(f"{kg}/ann_index/vectors").count()
    stats = append_batch(spark, kg, batch2, batch_id="b2")
    assert stats["ann_index_appended"] is True
    n_after = spark.read.parquet(f"{kg}/ann_index/vectors").count()
    # multi-table layout: one copy per table (default n_tables=4)
    assert n_after == n_before + stats["n_chunks"] * 4
    rag = GraphRAG(spark, kg, hamming_radius=2)
    assert rag.ann_family == "lsh"
    hits = rag.vector_chunks("Initech Group joint venture", top_k=5).collect()
    assert hits


def test_facade_refresh_after_append(spark, tmp_path, batches):
    """A live GraphRAG sees an appended KG after refresh(): new chunks
    retrievable, updated canonical ids in triplets mode."""
    batch1, batch2 = batches
    kg = str(tmp_path / "rfr")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    rag = GraphRAG(spark, kg)
    rag.table("chunks")  # warm the cache pre-append
    append_batch(spark, kg, batch2, batch_id="b2")
    rag.refresh()
    out = rag.query("Initech Group", mode="triplets", top_k=5)
    assert any("initech" in r["text"].lower() for r in out["chunks"].collect())


def test_append_dedups_refetched_urls(spark, tmp_path, batches):
    """A batch re-delivering an already-ingested url (crawl re-fetch)
    appends nothing for it — no duplicate chunks/edges; genuinely new
    pages in the same batch still land."""
    batch1, _ = batches
    kg = str(tmp_path / "urld")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    n_chunks_before = spark.read.parquet(f"{kg}/chunks/data").count()
    _, edges_before = _table_sets(spark, kg)
    # page 0 re-fetched verbatim + one new page
    refetch = _pages_df(spark, [
        _page(0, f"Dana Fox founded {_ENT_OLD} in 1999."),
        _page(30, "Erin Cole partnered with Acme Corporation on a joint venture."),
    ])
    stats = append_batch(spark, kg, refetch, batch_id="rf")
    assert stats["n_pages"] == 1  # only the new page survived the dedup
    n_chunks_after = spark.read.parquet(f"{kg}/chunks/data").count()
    assert n_chunks_after == n_chunks_before + stats["n_chunks"]
    _, edges_after = _table_sets(spark, kg)
    # old page-0 edges not duplicated (chunk_id would collide otherwise)
    assert len(edges_after) == len(edges_before) + stats["n_edges_appended"]


def test_facade_survives_compaction_via_refresh(spark, tmp_path, batches):
    """compact_tables swaps every snapshot dir under a live facade; a
    refreshed facade re-plans over the new listing and answers
    identically."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import (
        compact_tables,
    )

    batch1, batch2 = batches
    kg = str(tmp_path / "cref")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    append_batch(spark, kg, batch2, batch_id="b2")
    rag = GraphRAG(spark, kg)
    before = {
        (r["chunk_id"], round(r["score"], 9))
        for r in rag.query("Acme Corporation", top_k=5)["chunks"].collect()
    }
    compact_tables(spark, kg, target_partitions=1)
    rag.refresh()
    after = {
        (r["chunk_id"], round(r["score"], 9))
        for r in rag.query("Acme Corporation", top_k=5)["chunks"].collect()
    }
    assert after == before and after


def test_changed_refetch_counted_not_reappended(spark, tmp_path, batches):
    """A re-fetched url whose content CHANGED is still dropped by
    keep-first dedup but now COUNTED (VERDICT r4 next-round #5:
    revision mass must be visible to the crawl operator; row-level
    revision management is an Iceberg MERGE shape)."""
    import json

    batch1, _ = batches
    kg = str(tmp_path / "chg")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    n_chunks_before = spark.read.parquet(f"{kg}/chunks/data").count()
    # page 0 re-fetched with DIFFERENT content + one genuinely new page
    refetch = _pages_df(spark, [
        _page(0, "Dana Fox left the company amid controversy."),
        _page(31, "Erin Cole founded Initech Group in 2001."),
    ])
    stats = append_batch(spark, kg, refetch, batch_id="chg1")
    assert stats["n_urls_changed"] == 1
    assert stats["n_pages"] == 1  # the changed re-fetch was still dropped
    # keep-first: stored text for page 0 is the ORIGINAL fetch
    old = spark.read.parquet(f"{kg}/text/data").filter(
        F.col("url") == "https://inc.example/p/0"
    ).collect()
    assert len(old) == 1 and "Dana Fox founded" in old[0]["text"]
    assert spark.read.parquet(f"{kg}/chunks/data").count() == (
        n_chunks_before + stats["n_chunks"]
    )
    # the completion ledger line carries the revision count
    with open(f"{kg}/_applied_batches.jsonl") as fh:
        recs = [json.loads(l) for l in fh if l.strip()]
    done = [r for r in recs if r["batch_id"] == "chg1"
            and r.get("status") != "started"]
    assert len(done) == 1 and done[0]["n_urls_changed"] == 1


def test_started_marker_warns_and_retries(spark, tmp_path, batches):
    """A 'started' ledger line without completion (crash mid-apply) must
    NOT be treated as applied: the retry proceeds — with a warning the
    operator can audit on — and completes normally (ADVICE r4)."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans import incremental as inc

    batch1, batch2 = batches
    kg = str(tmp_path / "crashw")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    # simulate the crash: marker written, batch never completed
    inc._record_batch_started(kg, "crashed-1")
    assert inc._batch_applied(kg, "crashed-1") is False
    with pytest.warns(UserWarning, match="crashed mid-apply"):
        stats = append_batch(spark, kg, batch2, batch_id="crashed-1")
    assert stats.get("skipped") is not True and stats["n_pages"] == 2
    # now completed: the replay is a clean no-op
    assert append_batch(spark, kg, batch2, batch_id="crashed-1") == {
        "skipped": True, "batch_id": "crashed-1",
    }


def test_append_banded_path_equality(spark, tmp_path, batches):
    """Force the banded-LSH linking path (link_bruteforce_under=0) — the
    plan every 100 TB append runs — and assert the same SET-EQUAL
    outcome as the rebuild on this fixture (the crafted alias pair
    collides in the bands here; exactness above the gate is
    probabilistic by design, see module docstring)."""
    batch1, batch2 = batches
    inc_dir = str(tmp_path / "band")
    build_kg(spark, batch1, inc_dir, input_fingerprint="b1")
    stats = append_batch(
        spark, inc_dir, batch2, batch_id="b2", link_bruteforce_under=0
    )
    assert stats["n_relabeled_components"] == 1
    full_dir = str(tmp_path / "bandfull")
    build_kg(spark, batch1.unionByName(batch2), full_dir, input_fingerprint="b12")
    want = _table_sets(spark, full_dir)
    got = _table_sets(spark, inc_dir)
    assert got == want


def test_manifest_rowcounts_consistent_after_append(spark, tmp_path, batches):
    """ADVICE r4 #4: every stage manifest's n_rows must equal the actual
    parquet row count after an append — including the four stages that
    were previously bumped with delta=0 (term_chunk_edges, triples_raw,
    mentions, entity_pairs) and the two the slow path rewrites
    (entities, edges)."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.checkpoint import load_manifest

    batch1, batch2 = batches
    kg = str(tmp_path / "kg_counts")
    build_kg(spark, batch1, kg, input_fingerprint="b1")
    append_batch(spark, kg, batch2, batch_id="b2")  # merging (slow-path) append

    stages = [
        "text", "chunks", "chunk_embeddings", "term_chunk_edges",
        "triples_raw", "mentions", "entity_pairs", "entities", "edges",
    ]
    for stage in stages:
        data = os.path.join(kg, stage, "data")
        if not os.path.isdir(data):
            continue
        man = load_manifest(kg, stage)
        actual = spark.read.parquet(data).count()
        assert man is not None and man.get("n_rows") == actual, (
            stage, man and man.get("n_rows"), actual
        )
