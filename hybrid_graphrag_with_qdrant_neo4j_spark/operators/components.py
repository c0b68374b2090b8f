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
    rows_per_partition: int = 50_000,
) -> DataFrame:
    """pairs -> mapping(name, canonical_id), only for names appearing in
    pairs.  canonical_id = lexicographic min of the component.

    The working sets are re-partitioned to match the MEASURED edge count
    (``rows_per_partition`` rows per task) instead of inheriting
    ``spark.sql.shuffle.partitions``: a tiny alias graph under a wide
    session conf otherwise pays (partitions x rounds) empty-task
    scheduling overhead per iteration — measured 1.45 s -> 6.0 s for the
    IDENTICAL 36-entity graph when the pinned conf went 8 -> 64.  Large
    graphs keep the session's parallelism (target is capped at the
    current partition count)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    n_edges = edges.count()  # cheap: checkpointed
    target = max(1, min(edges.rdd.getNumPartitions(), n_edges // rows_per_partition + 1))
    if target < edges.rdd.getNumPartitions():
        edges = edges.repartition(target, "a").localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("label", F.col("node"))
        .repartition(target, "node")
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


# The mapping has one row per DISTINCT entity — not per alias group.  At
# 10^9 entities a forced broadcast is a multi-GB executor OOM, so the hint
# is gated on the measured entity count; above the gate AQE picks the
# strategy from its own runtime size estimate (it still broadcasts when
# the mapping is genuinely under spark.sql.autoBroadcastJoinThreshold).
# 1M rows of (name, canonical_id) strings ≈ 60-120 MB serialized — the
# upper edge of a sane broadcast on ordinary executors.
BROADCAST_MAPPING_LIMIT = 1_000_000


def canonical_edges(
    triples: DataFrame,
    mapping: DataFrame,
    n_entities: int | None = None,
    broadcast_limit: int = BROADCAST_MAPPING_LIMIT,
) -> DataFrame:
    """Rewrite triples(chunk_id, url, subj, pred, obj) to canonical ids
    via mapping(name, canonical_id): edges(subj_id, pred, obj_id,
    chunk_id, url), MERGE-deduped.

    Replaces the reference's quadratic UNWIND-cross-product MERGE
    (triplets.py:372-398); provenance columns kept (fixes the null
    r.source, retrieval.py:283).  Broadcast of the mapping is applied
    ONLY when ``n_entities`` is known and small (see
    BROADCAST_MAPPING_LIMIT); pass None to always defer to AQE.
    """
    force_broadcast = n_entities is not None and n_entities <= broadcast_limit

    def side(name_col: str) -> DataFrame:
        m = mapping.select(
            F.col("name").alias(name_col), F.col("canonical_id")
        )
        return F.broadcast(m) if force_broadcast else m

    return (
        triples.join(side("subj"), "subj")
        .withColumnRenamed("canonical_id", "subj_id")
        .join(side("obj"), "obj")
        .withColumnRenamed("canonical_id", "obj_id")
        .select("subj_id", "pred", "obj_id", "chunk_id", "url")
        # MERGE dedup via groupBy.agg — measured ~3x faster than
        # dropDuplicates on this shape (url is functionally determined
        # by chunk_id, so first() is deterministic)
        .groupBy("subj_id", "pred", "obj_id", "chunk_id")
        .agg(F.first("url").alias("url"))
    )
