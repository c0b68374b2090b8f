"""Bulk export of a built KG into Neo4j's offline-import layout —
the migration path BACK to the reference's store.

The reference pushes every triple into a live Neo4j over Bolt with
per-row MERGE round trips (graph_db.py's session.run loop); at crawl
scale that is the bottleneck Neo4j itself tells you to avoid — its
documented bulk path is ``neo4j-admin database import`` over CSV
files, which is exactly the shape a distributed engine can produce:
executor-parallel header-less CSV part files plus two tiny
driver-written header files (the ``--nodes=header.csv,data/part.*``
convention).  So the export stays one distributed write per table —
no driver-side iteration, no Bolt connection, no single-file funnel —
and a 10^9-entity graph exports as fast as the cluster can write CSV.

Layout under ``out_dir``::

    nodes_header.csv             entityId:ID,name,aliases:string[],:LABEL
    nodes/part-*.csv             one row per canonical entity
    relationships_header.csv     :START_ID,:END_ID,:TYPE,chunk_id,url
    relationships/part-*.csv     one row per canonical edge
    manifest.json                counts + the neo4j-admin command line

Quoting: RFC 4180 (quotes doubled, fields quoted on demand) — the
``neo4j-admin`` reader's default.  Array properties use the ``;``
delimiter (its default ``--array-delimiter``); alias strings have
``;`` folded to ``,`` so a pathological surface form cannot split.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

NODES_HEADER = "entityId:ID,name,aliases:string[],:LABEL"
RELS_HEADER = ":START_ID,:END_ID,:TYPE,chunk_id,url"

_CSV_OPTS = {"quote": '"', "escape": '"', "emptyValue": ""}


def _table(spark: SparkSession, kg_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(kg_dir, name, "data"))


def export_neo4j_bulk(
    spark: SparkSession, kg_dir: str, out_dir: str
) -> dict:
    """Write the KG's entity and edge snapshots as a ``neo4j-admin
    database import`` file set; returns the manifest dict.

    Nodes: one row per canonical entity, its surface forms collected
    into a sorted ``;``-array (the alias fold the linker computed —
    Neo4j gets it as a real list property).  Relationships: the
    canonical edge table verbatim — ``pred`` is the relationship type
    (already sanitized to identifier-safe form by the F7 relation
    sanitizer at extraction time), chunk/url provenance as properties.
    """
    os.makedirs(out_dir, exist_ok=True)
    ents = _table(spark, kg_dir, "entities")
    edges = _table(spark, kg_dir, "edges")

    nodes = (
        ents.groupBy("canonical_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_set(F.translate(F.col("name"), ";", ","))
                ),
                ";",
            ).alias("aliases")
        )
        .select(
            F.col("canonical_id").alias("entityId"),
            F.col("canonical_id").alias("name"),
            "aliases",
            F.lit("Entity").alias("label"),
        )
    )
    rels = edges.select(
        F.col("subj_id").alias("start"),
        F.col("obj_id").alias("end"),
        F.col("pred").alias("type"),
        "chunk_id",
        "url",
    )

    nodes_dir = os.path.join(out_dir, "nodes")
    rels_dir = os.path.join(out_dir, "relationships")
    nodes.write.mode("overwrite").options(**_CSV_OPTS).csv(nodes_dir)
    rels.write.mode("overwrite").options(**_CSV_OPTS).csv(rels_dir)

    with open(os.path.join(out_dir, "nodes_header.csv"), "w") as f:
        f.write(NODES_HEADER + "\n")
    with open(os.path.join(out_dir, "relationships_header.csv"), "w") as f:
        f.write(RELS_HEADER + "\n")

    manifest = {
        "format": "neo4j-admin database import",
        "n_nodes": nodes.count(),
        "n_relationships": rels.count(),
        "array_delimiter": ";",
        "import_command": (
            "neo4j-admin database import full "
            f"--nodes={out_dir}/nodes_header.csv,{out_dir}/nodes/part-.* "
            f"--relationships={out_dir}/relationships_header.csv,"
            f"{out_dir}/relationships/part-.* "
            '--array-delimiter=";" neo4j'
        ),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
