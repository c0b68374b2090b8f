"""Connected components by iterative hash-min label propagation
(SURVEY.md J7 replacement, §4 custom work #1).

The reference canonicalizes similar entities with a quadratic
UNWIND-cross-product MERGE per triple (triplets.py:372-398).  The
set-oriented equivalent: similarity pairs form an undirected edge list;
connected components assign every member the component-minimum name;
every entity maps to one canonical id.

Implementation is GraphFrames-style hash-min over DataFrames:
  label(v) <- min(label(v), min over neighbors' labels), iterate to
fixpoint.  Each round is one shuffle (join + groupBy on the same key —
co-partitioned, so AQE reuses the exchange).  ``localCheckpoint``
truncates the growing lineage each round (iterative-plan blowup is the
classic failure mode).  Converges in O(component diameter) rounds; alias
groups have tiny diameters, and the deterministic tie-break (min name)
makes output invariant to partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "name_a",
    dst: str = "name_b",
    max_iter: int = 50,
) -> DataFrame:
    """pairs -> mapping(name, canonical_id), only for names appearing in
    pairs.  canonical_id = lexicographic min of the component."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = (
            edges.join(labels, edges.a == labels.node)
            .select(F.col("b").alias("node"), "label")
        )
        # lazy localCheckpoint: materialized by the change-count job below
        # -> one Spark job per round instead of two, lineage still truncated
        new_labels = (
            labels.select("node", "label")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("name"), F.col("label").alias("canonical_id"))


def canonical_mapping(all_names: DataFrame, pairs: DataFrame) -> DataFrame:
    """Every entity name -> canonical_id (identity for singletons).
    all_names must have a ``name`` column."""
    cc = connected_components(pairs)
    return (
        all_names.select("name")
        .dropDuplicates(["name"])
        .join(cc, "name", "left")
        .select("name", F.coalesce("canonical_id", "name").alias("canonical_id"))
    )
