"""End-to-end facade test: build KG -> query in all three reference modes."""

import pytest
from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kgq"))
    pages = corpus.pages_spark_df(spark, 120, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="facade:120", max_tokens=80)
    return GraphRAG(spark, out)


def test_hybrid_mode(kg):
    res = kg.query("Who founded Globex Systems?", mode="hybrid", top_k=5)
    rows = res["chunks"].collect()
    assert 0 < len(rows) <= 5
    assert res["triplets"] is None
    assert {"chunk_id", "text", "score"} <= set(rows[0].asDict())
    # top chunk should actually mention the probed entity
    assert any("Globex" in r["text"] for r in rows)


def test_context_mode_includes_neighbors(kg):
    res = kg.query("Acme Corporation", mode="context", top_k=3, context_size=1)
    rows = res["chunks"].collect()
    assert rows
    matches = [r for r in rows if r["is_match"]]
    neighbors = [r for r in rows if not r["is_match"]]
    assert matches
    # neighbor chunks come from the same documents, adjacent indices
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_index"])
    for doc, idxs in by_doc.items():
        assert max(idxs) - min(idxs) <= 2 * 1 + 1


def test_triplets_mode(kg):
    res = kg.query("Acme Corporation", mode="triplets", top_k=5)
    trips = res["triplets"].collect()
    assert 0 < len(trips) <= 5
    assert all(t["subj_id"] == "acme corporation" for t in trips)


def test_vector_and_graph_agree_on_obvious_query(kg):
    v = {r["chunk_id"] for r in kg.vector_chunks("Globex Systems partnership", 10).collect()}
    g = {r["chunk_id"] for r in kg.graph_chunks("Globex Systems partnership", 10).collect()}
    assert v and g


def test_cli_query_all_modes(kg, spark, monkeypatch, capsys):
    """The `run_pipeline.py query` CLI (reference `graphrag query` parity,
    VERDICT r2 next-round #5): drive main() end-to-end against a built KG
    directory in all three modes and check the rendered output."""
    import run_pipeline

    # the CLI would getOrCreate (-> the shared test session) and then
    # stop it; keep the session alive for the rest of the suite
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    kg_dir = kg._dir
    for mode, marker in (
        ("hybrid", "Top "),
        ("context", "MATCH"),
        ("triplets", "RELATED TRIPLETS"),
    ):
        monkeypatch.setattr(
            "sys.argv",
            ["run_pipeline.py", "query", "Who founded Globex Systems?",
             "--kg-dir", kg_dir, "--mode", mode, "--top-k", "5"],
        )
        run_pipeline.main()
        out = capsys.readouterr().out
        assert "QUERY RESULTS:" in out
        assert marker in out, f"mode={mode}: marker {marker!r} missing\n{out[:600]}"
    # triplets mode must actually print an edge arrow
    assert "-[" in out and "]->" in out


def test_query_many_matches_per_query_hybrid(kg):
    """Facade batch path: query_many's per-query rows must equal the
    single-query hybrid mode's fused scores."""
    queries = [("q0", "Who founded Globex Systems?"), ("q1", "Acme Corporation")]
    many = kg.query_many(queries, top_k=5)
    rows = many.collect()
    assert {r["query_id"] for r in rows} == {"q0", "q1"}
    got = {(r["query_id"], r["chunk_id"], round(r["score"], 9)) for r in rows}
    want = set()
    for qid, qtext in queries:
        res = kg.query(qtext, mode="hybrid", top_k=5)
        for r in res["chunks"].collect():
            want.add((qid, r["chunk_id"], round(r["score"], 9)))
    assert got == want
    # text column joined in
    assert all(r["text"] for r in rows)


def test_query_many_context_mode_matches_per_query(kg):
    """Batch context expansion: query_many(mode=context) must equal the
    single-query context mode per query (same dedup/is_match/score)."""
    queries = [("q0", "Who founded Globex Systems?"), ("q1", "Acme Corporation")]
    many = kg.query_many(queries, top_k=3, mode="context", context_size=1)
    got = {
        (r["query_id"], r["chunk_id"], bool(r["is_match"]), round(r["score"], 9))
        for r in many.collect()
    }
    want = set()
    for qid, qtext in queries:
        res = kg.query(qtext, mode="context", top_k=3, context_size=1)
        for r in res["chunks"].collect():
            want.add((qid, r["chunk_id"], bool(r["is_match"]), round(r["score"], 9)))
    assert got == want and got


def test_cli_query_many(kg, spark, monkeypatch, capsys, tmp_path):
    """query-many verb: whole batch in one job, grouped rendering."""
    import run_pipeline

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    qfile = tmp_path / "queries.txt"
    qfile.write_text("Who founded Globex Systems?\nAcme Corporation\n")
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "query-many", "--kg-dir", kg._dir,
         "--queries-file", str(qfile), "--top-k", "3"],
    )
    run_pipeline.main()
    out = capsys.readouterr().out
    assert "BATCH QUERY RESULTS (2 queries" in out
    assert "[q0] Who founded Globex Systems?" in out
    assert "[q1] Acme Corporation" in out
    assert "score=" in out
