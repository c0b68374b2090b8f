"""Temporal provenance operators: edge history windows, as-of views,
entity timelines — small-fixture parity plus plan gates."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark.operators import temporal

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def fixture(spark):
    pages = spark.createDataFrame(
        [
            ("u1", _ts(0)),
            ("u2", _ts(10)),
            ("u3", _ts(20)),
            ("u4", _ts(30)),
        ],
        "url string, warc_ts timestamp",
    )
    edges = spark.createDataFrame(
        [
            # edge A supported by u1 (early) and u3 (later), two chunks
            ("a", "r", "b", "c1", "u1"),
            ("a", "r", "b", "c3", "u3"),
            # edge B only by the latest page
            ("a", "r", "c", "c4", "u4"),
            # edge C twice from the SAME page, different chunks
            ("b", "s", "c", "c2", "u2"),
            ("b", "s", "c", "c2b", "u2"),
        ],
        "subj_id string, pred string, obj_id string, chunk_id string, url string",
    )
    return pages, edges


def test_edge_history_windows_and_support(spark, fixture):
    pages, edges = fixture
    got = {
        (r["subj_id"], r["pred"], r["obj_id"]): r
        for r in temporal.edge_history(edges, pages).collect()
    }
    assert set(got) == {("a", "r", "b"), ("a", "r", "c"), ("b", "s", "c")}
    arb = got[("a", "r", "b")]
    assert arb["first_seen"] == _ts(0) and arb["last_seen"] == _ts(20)
    assert arb["n_chunks"] == 2 and arb["n_pages"] == 2
    bsc = got[("b", "s", "c")]
    assert bsc["first_seen"] == bsc["last_seen"] == _ts(10)
    assert bsc["n_chunks"] == 2 and bsc["n_pages"] == 1


def test_edges_asof_filters_and_converges_to_full_graph(spark, fixture):
    pages, edges = fixture
    at = lambda m: {
        (r["subj_id"], r["pred"], r["obj_id"])
        for r in temporal.edges_asof(edges, pages, _ts(m)).collect()
    }
    assert at(-1) == set()
    assert at(0) == {("a", "r", "b")}
    assert at(10) == {("a", "r", "b"), ("b", "s", "c")}
    # at max ts the as-of view IS the full distinct edge set
    full = {
        (r["subj_id"], r["pred"], r["obj_id"])
        for r in edges.select("subj_id", "pred", "obj_id").distinct().collect()
    }
    assert at(30) == full


def test_edges_asof_plan_semi_join_with_pushed_filter(spark, fixture):
    pages, edges = fixture
    plan = (
        temporal.edges_asof(edges, pages, _ts(10))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_cli_analytics_timeline_and_asof(spark, tmp_path_factory, monkeypatch, capsys):
    """`analytics --timeline ENTITY --asof TS` end-to-end over a small
    built KG: the timeline window sits inside the corpus crawl span and
    the as-of count is a strict subset that converges to the total."""
    import json

    import run_pipeline
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path_factory.mktemp("kg_tl"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="tl:40")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "analytics", "--kg-dir", out, "--top", "2",
         "--timeline", "Acme Corporation", "--asof", "2025-01-01T00:10:00"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["timeline"], "hot entity must have a timeline"
    tl = got["timeline"][0]
    assert tl["entity_name"] == "acme corporation"
    assert tl["first_seen"] <= tl["last_seen"]
    assert tl["n_mentions"] >= tl["n_pages"] >= 1
    asof = got["asof"]
    assert 0 < asof["n_edges_asof"] < asof["n_edges_total"]


def test_entity_timeline(spark, fixture):
    pages, _ = fixture
    chunks = spark.createDataFrame(
        [("c1", "u1"), ("c2", "u2"), ("c3", "u3")],
        "chunk_id string, url string",
    )
    mentions = spark.createDataFrame(
        [("c1", "acme"), ("c3", "acme"), ("c2", "globex"), ("c2", "acme")],
        "chunk_id string, entity_name string",
    )
    got = {
        r["entity_name"]: r
        for r in temporal.entity_timeline(mentions, chunks, pages).collect()
    }
    acme = got["acme"]
    assert acme["first_seen"] == _ts(0) and acme["last_seen"] == _ts(20)
    assert acme["n_mentions"] == 3 and acme["n_pages"] == 3
    assert got["globex"]["n_mentions"] == 1 and got["globex"]["n_pages"] == 1
