"""ANN serving-quality evaluation (round 5): ``evaluate_ann`` reports
recall@k of the WRITTEN index vs the exact brute-force scan over a
deterministic self-query sample — the operational probe an operator
runs after appends/prune/reindex before touching n_probe.

Key invariant: probing EVERY bucket makes the pruned scan see the same
candidate set as the exact scan, and both sides share the (score desc,
id asc) tie order — so recall at full probing must be exactly 1.0, and
recall is monotone in n_probe.
"""

import json

import pytest

from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.evaluate import evaluate_ann
from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg


@pytest.fixture(scope="module")
def ivf_kg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_eval_ivf"))
    pages = corpus.pages_spark_df(spark, 60, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="eval:60",
             ann_index="ivf", ann_k=4)
    return out


def test_evaluate_full_probe_is_exact_and_monotone(spark, ivf_kg):
    full = evaluate_ann(spark, ivf_kg, sample=16, top_k=5, n_probe=4)
    assert full["family"] == "ivf"
    assert full["n_queries"] == 16
    assert full["recall_at_k"] == 1.0          # all buckets probed == exact
    assert full["mean_scan_fraction"] == 1.0

    narrow = evaluate_ann(spark, ivf_kg, sample=16, top_k=5, n_probe=1)
    assert 0.0 <= narrow["recall_at_k"] <= full["recall_at_k"]
    assert 0.0 < narrow["mean_scan_fraction"] < 1.0
    # deterministic: same seed, same report
    again = evaluate_ann(spark, ivf_kg, sample=16, top_k=5, n_probe=1)
    assert again["recall_at_k"] == narrow["recall_at_k"]
    assert again["mean_scan_fraction"] == narrow["mean_scan_fraction"]


def test_evaluate_lsh_family(spark, tmp_path):
    out = str(tmp_path / "kg_eval_lsh")
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="eval-lsh:40",
             ann_index="lsh", ann_bits=4, ann_tables=2)
    rep = evaluate_ann(spark, out, sample=8, top_k=5)
    assert rep["family"] == "lsh"
    assert rep["n_probe"] is None
    assert 0.0 <= rep["recall_at_k"] <= 1.0
    assert "mean_scan_fraction" not in rep


def test_evaluate_requires_index(spark, tmp_path):
    out = str(tmp_path / "kg_plain")
    pages = corpus.pages_spark_df(spark, 20, partitions=2)
    build_kg(spark, pages, out, input_fingerprint="eval-plain:20")
    with pytest.raises(ValueError):
        evaluate_ann(spark, out)


def test_cli_evaluate_verb(spark, ivf_kg, monkeypatch, capsys):
    import run_pipeline

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "evaluate", "--kg-dir", ivf_kg,
         "--sample", "8", "--top-k", "5", "--n-probe", "2"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["family"] == "ivf" and got["n_queries"] == 8
    assert 0.0 <= got["recall_at_k"] <= 1.0
