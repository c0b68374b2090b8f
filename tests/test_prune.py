"""Corpus curation over a built KG (round 5): ``prune_kg`` deletes every
doc matching a drop selector from all doc-scoped tables (+ ANN vectors)
and repairs the entity graph EXACTLY via ``gc_entities`` — the result
must be SET-EQUAL to a full rebuild over the kept corpus, including
orphaned entities vanishing and bridged components splitting.

The reference's store only grows (cli/main.py:115-156 re-ingests, never
curates); at crawl scale "this slice turned out to be spam" is routine,
and the prune verb reuses the replace path's purge machinery instead of
re-running the extraction/embedding passes a rebuild would pay.
"""

import json
import os

import pytest

from hybrid_graphrag_with_qdrant_neo4j_spark.plans.checkpoint import load_manifest
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import prune_kg
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

_BASE = "Global Amalgamated Consolidated Industries Incorporated"
# same hash-embedder bridge chain as tests/test_replace.py:
#   N1~N2 and N2~N3 >= 0.96 but N1~N3 < 0.96 — N2 bridges the component
_N1 = _BASE + "xq"
_N2 = _BASE
_N3 = _BASE + "abcd"


def _page(url, sentence):
    html = (
        "<html><head><title>t</title></head><body><p>"
        + sentence
        + " </p></body></html>"
    ).encode()
    return (url, None, html, sentence, "en")


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
    text = {
        (r["url"], r["text"])
        for r in spark.read.parquet(f"{kg_dir}/text/data").collect()
    }
    chunks = {
        (r["chunk_id"], r["text"])
        for r in spark.read.parquet(f"{kg_dir}/chunks/data").collect()
    }
    return ents, edges, text, chunks


def test_prune_where_equals_rebuild_with_component_split(spark, tmp_path):
    """Prune the doc that holds the ONLY mention of the bridge entity N2:
    the kept KG must equal a rebuild over the kept pages — N2 gone, the
    N1/N3 component split, victims' chunks out of the ANN index."""
    keep = [
        _page("https://ok.example/a", f"Dana Fox founded {_N1} in 1999."),
        _page("https://ok.example/b", f"Erin Cole founded {_N3} in 1999."),
        _page("https://ok.example/c", "Wendy Mak founded Hooli Systems in 1999."),
    ]
    junk = [
        _page("https://spam.example/junk/1",
              f"{_N2} partnered with Acme Corporation on a joint venture."),
        _page("https://spam.example/junk/2",
              "Initech Group partnered with Vandelay Industries on a deal."),
    ]
    pruned = str(tmp_path / "pruned")
    build_kg(spark, _pages_df(spark, keep + junk), pruned,
             input_fingerprint="v1", ann_index="ivf", ann_k=4)

    ents0 = dict(
        (r["name"], r["canonical_id"])
        for r in spark.read.parquet(f"{pruned}/entities/data").collect()
    )
    n1, n2, n3 = _N1.lower(), _N2.lower(), _N3.lower()
    assert ents0[n1] == ents0[n2] == ents0[n3] == n2  # bridged pre-prune

    stats = prune_kg(spark, pruned, where="url like '%/junk/%'", batch_id="p1")
    assert stats["n_docs_pruned"] == 2
    assert stats["n_chunks_purged"] >= 2
    assert stats["ann_index_purged"] is True
    assert stats["entity_gc"]["n_entities"] > 0

    full = str(tmp_path / "full")
    build_kg(spark, _pages_df(spark, keep), full, input_fingerprint="v2")
    assert _table_sets(spark, pruned) == _table_sets(spark, full)

    ents1 = dict(
        (r["name"], r["canonical_id"])
        for r in spark.read.parquet(f"{pruned}/entities/data").collect()
    )
    assert n2 not in ents1           # orphaned by the prune
    assert ents1[n1] != ents1[n3]    # the component split

    # ANN index holds exactly the live chunks' vectors
    vec_ids = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{pruned}/ann_index/vectors")
        .select("chunk_id").collect()
    }
    chunk_ids = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{pruned}/chunks/data")
        .select("chunk_id").collect()
    }
    assert vec_ids == chunk_ids

    # manifests stay exact through the purge+gc arithmetic
    for stage in ["text", "chunks", "chunk_embeddings", "term_chunk_edges",
                  "triples_raw", "mentions", "entity_pairs", "entities", "edges"]:
        data = os.path.join(pruned, stage, "data")
        if not os.path.isdir(data):
            continue
        man = load_manifest(pruned, stage)
        assert man["n_rows"] == spark.read.parquet(data).count(), stage

    # same batch id replays as a ledger no-op
    again = prune_kg(spark, pruned, where="url like '%/junk/%'", batch_id="p1")
    assert again.get("skipped") is True


def test_prune_min_quality_dry_run_and_idempotence(spark, tmp_path):
    good = [
        _page("https://ok.example/a",
              "Dana Fox founded Acme Corporation in 1999 and the firm grew "
              "with a steady team of engineers in the old town."),
        _page("https://ok.example/b",
              "Erin Cole founded Globex Systems in 2001 and it was one of "
              "the best places to work in the whole region for a while."),
    ]
    junk = [_page("https://spam.example/z", "zxq!!! ??? !!! ,,,, ....")]
    kg = str(tmp_path / "kg")
    build_kg(spark, _pages_df(spark, good + junk), kg, input_fingerprint="q1")

    dry = prune_kg(spark, kg, min_quality=0.3, dry_run=True)
    assert dry["dry_run"] is True
    assert dry["n_docs_dropped"] == 1
    assert dry["by_lang"] == {"en": 1}
    # dry run mutates nothing
    assert spark.read.parquet(f"{kg}/text/data").count() == 3

    stats = prune_kg(spark, kg, min_quality=0.3)
    assert stats["n_docs_pruned"] == 1
    urls = {r["url"] for r in spark.read.parquet(f"{kg}/text/data").collect()}
    assert urls == {"https://ok.example/a", "https://ok.example/b"}

    # default batch id hashes the selector: same prune replays as no-op
    again = prune_kg(spark, kg, min_quality=0.3)
    assert again.get("skipped") is True
    # a fresh batch id re-applies and finds zero victims — still recorded
    zero = prune_kg(spark, kg, min_quality=0.3, batch_id="q-again")
    assert zero["n_docs_pruned"] == 0


def test_prune_requires_selector_and_built_kg(spark, tmp_path):
    with pytest.raises(ValueError):
        prune_kg(spark, str(tmp_path / "kg"))
    with pytest.raises(FileNotFoundError):
        prune_kg(spark, str(tmp_path / "kg"), min_quality=0.5)


def test_cli_prune_verb(spark, tmp_path_factory, monkeypatch, capsys):
    import run_pipeline
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus

    out = str(tmp_path_factory.mktemp("kg_prune"))
    pages = corpus.pages_spark_df(spark, 30, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="prune:30")
    n_before = spark.read.parquet(f"{out}/text/data").count()

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "prune", "--kg-dir", out,
         "--where", "url like '%/2%'", "--dry-run"],
    )
    run_pipeline.main()
    dry = json.loads(capsys.readouterr().out)
    assert dry["dry_run"] is True and dry["n_docs_dropped"] > 0

    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "prune", "--kg-dir", out,
         "--where", "url like '%/2%'"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["n_docs_pruned"] == dry["n_docs_dropped"]
    assert spark.read.parquet(f"{out}/text/data").count() == n_before - got["n_docs_pruned"]


def test_pruned_url_can_reingest_via_append(spark, tmp_path):
    """Prune removes a doc's rows from the text snapshot, so the URL
    dedup shield no longer blocks it: a later crawl batch re-delivering
    that URL re-ingests it (deliberate — prune is curation, not a
    blocklist; a permanent ban belongs in the crawl frontier)."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch

    keep = _page("https://ok.example/a",
                 "Dana Fox founded Acme Corporation in 1999.")
    spam = _page("https://spam.example/x",
                 "Erin Cole founded Globex Systems in 2001.")
    kg = str(tmp_path / "kg")
    build_kg(spark, _pages_df(spark, [keep, spam]), kg, input_fingerprint="r1")

    stats = prune_kg(spark, kg, where="url like '%spam%'", batch_id="p1")
    assert stats["n_docs_pruned"] == 1

    re_crawl = append_batch(
        spark, kg, _pages_df(spark, [spam]), batch_id="crawl2"
    )
    assert re_crawl["n_pages"] == 1
    urls = {r["url"] for r in spark.read.parquet(f"{kg}/text/data").collect()}
    assert "https://spam.example/x" in urls


def test_prune_min_host_quality_drops_whole_hosts(spark, tmp_path_factory):
    """Host-level curation: every doc of a below-threshold host drops
    (even its individually good pages), every doc of an above-threshold
    host survives (even its individually bad pages)."""
    from pyspark.sql import functions as F

    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.functions import text_quality as TQ
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import webgraph as WG

    out = str(tmp_path_factory.mktemp("kg_hostq"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="hostq:40")

    text = spark.read.parquet(os.path.join(out, "text", "data"))
    host_means = {
        r["host"]: r["mq"]
        for r in text.select(
            WG.host_of("url").alias("host"),
            TQ.quality_score(F.col("text")).alias("q"),
        )
        .groupBy("host")
        .agg(F.avg("q").alias("mq"))
        .collect()
    }
    means = sorted(host_means.values())
    tau = means[len(means) // 2]  # median: some hosts drop, some stay
    bad_hosts = {h for h, m in host_means.items() if m < tau}
    assert bad_hosts and len(bad_hosts) < len(host_means)

    dry = prune_kg(spark, out, min_host_quality=tau, dry_run=True)
    urls_by_host = {
        r["url"]: r["h"]
        for r in text.select("url", WG.host_of("url").alias("h")).collect()
    }
    want_n = sum(1 for u, h in urls_by_host.items() if h in bad_hosts)
    assert dry["n_docs_dropped"] == want_n

    got = prune_kg(spark, out, min_host_quality=tau)
    assert got["n_docs_pruned"] == want_n
    survivors = spark.read.parquet(os.path.join(out, "text", "data"))
    left_hosts = {
        r["h"] for r in survivors.select(WG.host_of("url").alias("h")).collect()
    }
    assert left_hosts == set(host_means) - bad_hosts
    # replay of the same selector is a ledger no-op
    again = prune_kg(spark, out, min_host_quality=tau)
    assert again.get("skipped") is True
