"""Neo4j bulk-import export: round-trip the CSV file set back through
Spark's CSV reader and set-compare against the source KG tables."""

import json
import os

import pytest

from hybrid_graphrag_with_qdrant_neo4j_spark.plans import export as ex


@pytest.fixture(scope="module")
def kg_dir(spark, tmp_path_factory):
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path_factory.mktemp("kg_export"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="export:40")
    return out


@pytest.fixture(scope="module")
def exported(spark, kg_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("neo4j_bulk"))
    manifest = ex.export_neo4j_bulk(spark, kg_dir, out)
    return out, manifest


def _read_csv(spark, path, cols):
    df = spark.read.options(quote='"', escape='"').csv(path)
    return df.toDF(*cols)


def test_export_nodes_roundtrip(spark, kg_dir, exported):
    out, manifest = exported
    nodes = _read_csv(
        spark,
        os.path.join(out, "nodes"),
        ["entityId", "name", "aliases", "label"],
    ).collect()
    from pyspark.sql import functions as F

    ents = spark.read.parquet(os.path.join(kg_dir, "entities", "data"))
    canon = {
        r["canonical_id"]: set(r["names"])
        for r in ents.groupBy("canonical_id")
        .agg(F.collect_set("name").alias("names"))
        .collect()
    }
    assert {r["entityId"] for r in nodes} == set(canon)
    assert manifest["n_nodes"] == len(canon)
    for r in nodes:
        assert r["name"] == r["entityId"]
        assert r["label"] == "Entity"
        # alias array reconstructs the surface-form set (';' folded)
        got_aliases = set((r["aliases"] or "").split(";"))
        want = {n.replace(";", ",") for n in canon[r["entityId"]]}
        assert got_aliases == want
        # the canonical id itself is one of its surface forms
        assert r["entityId"].replace(";", ",") in got_aliases


def test_export_relationships_roundtrip(spark, kg_dir, exported):
    out, manifest = exported
    rels = _read_csv(
        spark,
        os.path.join(out, "relationships"),
        ["start", "end", "type", "chunk_id", "url"],
    )
    edges = spark.read.parquet(os.path.join(kg_dir, "edges", "data"))
    got = {tuple(r) for r in rels.collect()}
    want = {
        (r["subj_id"], r["obj_id"], r["pred"], r["chunk_id"], r["url"])
        for r in edges.collect()
    }
    assert got == want
    assert manifest["n_relationships"] == len(want)
    # every relationship endpoint resolves to an exported node id —
    # neo4j-admin hard-fails on dangling :START_ID/:END_ID
    node_ids = {
        r["entityId"]
        for r in _read_csv(
            spark, os.path.join(out, "nodes"),
            ["entityId", "name", "aliases", "label"],
        ).collect()
    }
    assert {s for (s, *_rest) in got} <= node_ids
    assert {e for (_s, e, *_rest) in got} <= node_ids


def test_export_headers_and_manifest(exported):
    out, manifest = exported
    assert open(os.path.join(out, "nodes_header.csv")).read().strip() == \
        ex.NODES_HEADER
    assert open(
        os.path.join(out, "relationships_header.csv")
    ).read().strip() == ex.RELS_HEADER
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest
    assert "neo4j-admin database import full" in manifest["import_command"]
    assert "--array-delimiter" in manifest["import_command"]


def test_export_quoting_survives_commas_and_quotes(spark, tmp_path):
    """RFC 4180 round-trip: values with commas, quotes, and semicolons
    in surface forms survive the CSV layer byte-exactly."""
    kg = str(tmp_path / "kg")
    for name, rows, schema in [
        (
            "entities",
            [('he said "hi", twice', "e1", [0.0]),
             ("plain;form", "e1", [0.0]),
             ("e1", "e1", [0.0])],
            "name string, canonical_id string, embedding array<float>",
        ),
        (
            "edges",
            [("e1", 'REL', "e1", "c,1", 'u"r"l')],
            "subj_id string, pred string, obj_id string, "
            "chunk_id string, url string",
        ),
    ]:
        spark.createDataFrame(rows, schema).write.parquet(
            os.path.join(kg, name, "data")
        )
    out = str(tmp_path / "bulk")
    ex.export_neo4j_bulk(spark, kg, out)
    nodes = _read_csv(
        spark, os.path.join(out, "nodes"),
        ["entityId", "name", "aliases", "label"],
    ).collect()
    assert len(nodes) == 1
    assert set(nodes[0]["aliases"].split(";")) == {
        'he said "hi", twice', "plain,form", "e1"
    }
    rels = _read_csv(
        spark, os.path.join(out, "relationships"),
        ["start", "end", "type", "chunk_id", "url"],
    ).collect()
    assert (rels[0]["chunk_id"], rels[0]["url"]) == ("c,1", 'u"r"l')


def test_cli_export_verb(spark, kg_dir, tmp_path, monkeypatch, capsys):
    import run_pipeline

    out = str(tmp_path / "cli_bulk")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "export", "--kg-dir", kg_dir, "--out-dir", out],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["n_nodes"] > 0 and got["n_relationships"] > 0
    assert os.path.isfile(os.path.join(out, "manifest.json"))
    assert any(f.startswith("part-") for f in os.listdir(
        os.path.join(out, "nodes")))
