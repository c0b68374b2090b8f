"""Entity-graph analytics over the canonical edge table: degree
centrality, fixed-iteration PageRank, k-hop neighborhood expansion,
and label-propagation community detection.

The reference stores its graph in Neo4j, where these questions are
Cypher one-liners over a single-node store (e.g. ``MATCH (e)-[r]->()
RETURN e, count(r)``); an analytics engine over a distributed edge
DataFrame needs them as first-class operators.  All are pure
DataFrame compositions — no UDFs, no unbounded driver-side data (the
rank operators offer an OPT-IN ``local_under`` gate that collects a
bounded small-graph edge list and iterates in numpy, the same
scale-adaptive dispatch operators/linking uses — 10 iterations over a
97-node host graph are otherwise ~20 scheduler rounds of constants):

- :func:`degree_centrality` is two shuffle-free partial aggregations
  joined on the entity id.
- :func:`pagerank` is the standard iterative join/agg loop (GraphX /
  GraphFrames semantics, un-normalized formulation).  The edge table
  with its out-degree column is computed once, explicitly
  ``repartition("src")``-ed, and persisted — the cached partitioning
  satisfies the join requirement, so each iteration shuffles only
  RANK-sized data (ranks hashed to src + map-side-combined dst
  partials), never the edge table (plan-gated:
  ``test_pagerank_iteration_reuses_cached_edges``).  Rank lineage is
  cut with ``localCheckpoint`` every few iterations so the Catalyst
  plan stays O(1)-deep instead of O(iterations).

Determinism contract (shared with the DuckDB oracle twin in
``__spark_entry__``): graph = DISTINCT directed (src, dst) pairs
(multi-edges collapse, self-loops kept), node set = edge endpoints,
``rank_0 = 1.0``, ``rank_{t+1}(v) = (1-d) + d * sum_{u->v}
rank_t(u)/outdeg(u)`` — the dangling-mass-dropping variant GraphX
uses, chosen because it is expressible as the same relational algebra
on both engines.  Double-precision sums may differ between engines in
the last ulp (different reduction order); consumers compare at 6dp.

At 100 TB scale: the per-iteration shuffle is the irreducible cost and
it is keyed by ``dst`` — a skewed in-degree hub (every crawl corpus
has a few) concentrates its partial sums map-side first because the
aggregation is a hash-partial ``sum``, the same mitigation the salted
aggregates use elsewhere; AQE skew-join handles the rank-join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def degree_centrality(
    edges: DataFrame, src: str = "subj_id", dst: str = "obj_id"
) -> DataFrame:
    """Per-entity out/in/total degree over DISTINCT directed edges.

    Returns (entity_id, out_degree, in_degree, degree); entities that
    appear only as source (or only as destination) get 0 for the
    missing direction.
    """
    g = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out = g.groupBy(F.col("src").alias("entity_id")).agg(
        F.count("*").alias("out_degree")
    )
    inn = g.groupBy(F.col("dst").alias("entity_id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out.join(inn, "entity_id", "full_outer")
        .select(
            "entity_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (
                F.coalesce("out_degree", F.lit(0))
                + F.coalesce("in_degree", F.lit(0))
            ).alias("degree"),
        )
    )


def _iteration_contribs(ge: DataFrame, ranks: DataFrame) -> DataFrame:
    """One PageRank iteration's incoming mass per destination:
    ranks ⋈ cached (src, dst, outdeg) on src, then a partial-combined
    sum keyed by dst."""
    return (
        ge.join(
            ranks.select(F.col("entity_id").alias("src"), F.col("pagerank")),
            "src",
        )
        .groupBy(F.col("dst").alias("entity_id"))
        .agg(F.sum(F.col("pagerank") / F.col("_outdeg")).alias("_mass"))
    )


def _local_rank_rows(spark, pairs, weights, damping, iterations, id_type):
    """Driver-local PageRank over a collected (bounded) edge list —
    same iteration contract as the distributed loop; numpy accumulation
    instead of 2·iterations scheduler rounds.  ``weights`` is None for
    the unweighted form, else a float list aligned with ``pairs``."""
    import numpy as np
    from pyspark.sql import types as T

    nodes = sorted({p[0] for p in pairs} | {p[1] for p in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    srcs = np.array([idx[s] for s, _ in pairs], dtype=np.int64)
    dsts = np.array([idx[d] for _, d in pairs], dtype=np.int64)
    if weights is None:
        w = np.ones(len(pairs))
    else:
        w = np.asarray(weights, dtype=np.float64)
    outw = np.zeros(len(nodes))
    np.add.at(outw, srcs, w)
    r = np.ones(len(nodes))
    for _ in range(iterations):
        contrib = r[srcs] * w / outw[srcs]
        mass = np.zeros(len(nodes))
        np.add.at(mass, dsts, contrib)
        r = (1.0 - damping) + damping * mass
    schema = T.StructType(
        [
            T.StructField("entity_id", id_type, True),
            T.StructField("pagerank", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(n, float(r[idx[n]])) for n in nodes], schema
    )


def _local_ppr_rows(spark, pairs, seed_ids, damping, iterations, id_type):
    """Driver-local personalized PageRank over a collected (bounded)
    edge list — same contract as the distributed loop in
    :func:`personalized_pagerank` (restart = 1/|S| on the seed set,
    r_0 = restart, dangling mass dropped, ppr > 0 output filter)."""
    import numpy as np
    from pyspark.sql import types as T

    seed_ids = sorted(set(seed_ids))
    nodes = sorted(
        {p[0] for p in pairs} | {p[1] for p in pairs} | set(seed_ids)
    )
    idx = {n: i for i, n in enumerate(nodes)}
    srcs = np.array([idx[s] for s, _ in pairs], dtype=np.int64)
    dsts = np.array([idx[d] for _, d in pairs], dtype=np.int64)
    outdeg = np.zeros(len(nodes))
    np.add.at(outdeg, srcs, 1.0)
    restart = np.zeros(len(nodes))
    for s in seed_ids:
        restart[idx[s]] = 1.0 / len(seed_ids)
    r = restart.copy()
    for _ in range(iterations):
        contrib = r[srcs] / outdeg[srcs]
        mass = np.zeros(len(nodes))
        np.add.at(mass, dsts, contrib)
        r = (1.0 - damping) * restart + damping * mass
    schema = T.StructType(
        [
            T.StructField("entity_id", id_type, True),
            T.StructField("ppr", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(n, float(r[idx[n]])) for n in nodes if r[idx[n]] > 0.0], schema
    )


def pagerank(
    edges: DataFrame,
    src: str = "subj_id",
    dst: str = "obj_id",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
    local_under: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over DISTINCT directed edges.

    Returns (entity_id, pagerank).  See the module docstring for the
    exact iteration contract (un-normalized GraphX form, dangling mass
    dropped, rank_0 = 1.0).

    ``local_under``: scale-adaptive dispatch (same design as
    operators/linking's driver path under 10k entities).  When set and
    the DISTINCT edge list fits under it, the edges are collected ONCE
    (a bounded limit(n+1) probe, never an unbounded collect) and the
    iteration runs driver-local in numpy: 10 iterations over a tiny
    graph otherwise cost ~20 scheduler rounds of pure constants (~10-20s
    for a 97-node host graph).  Values agree with the distributed loop
    to float reduction order (consumers compare at 6dp — module
    docstring); above the gate the distributed loop runs unchanged.
    """
    g = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    if local_under:
        head = g.limit(local_under + 1).collect()
        if len(head) <= local_under:
            g.unpersist()
            return _local_rank_rows(
                edges.sparkSession,
                [(r["src"], r["dst"]) for r in head],
                None,
                damping,
                iterations,
                g.schema["src"].dataType,
            )
    nodes = (
        g.select(F.col("src").alias("entity_id"))
        .unionByName(g.select(F.col("dst").alias("entity_id")))
        .distinct()
        .persist()
    )
    outdeg = g.groupBy("src").agg(F.count("*").alias("_outdeg"))
    # (src, dst, outdeg) computed once; the explicit repartition pins
    # hashpartitioning(src) into the cache so the per-iteration join
    # shuffles only the rank side, never this table
    ge = g.join(outdeg, "src").repartition("src").persist()
    ge.count()

    ranks = nodes.select("entity_id", F.lit(1.0).alias("pagerank"))
    prev = None
    for i in range(iterations):
        contribs = _iteration_contribs(ge, ranks)
        ranks = nodes.join(contribs, "entity_id", "left").select(
            "entity_id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("_mass", F.lit(0.0))
            ).alias("pagerank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            # cut lineage: without this the plan nests one join/agg per
            # iteration and Catalyst planning time grows superlinearly
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = ranks
    g.unpersist()
    nodes.unpersist()
    ge.unpersist()
    return ranks


def weighted_pagerank(
    edges: DataFrame,
    src: str = "subj_id",
    dst: str = "obj_id",
    weight: str = "n_links",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
    local_under: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank with edge-weight-proportional mass
    split: r_{k+1}(v) = (1-d) + d·Σ_{u→v} r_k(u)·w(u,v)/W(u), where
    W(u) = Σ w(u,·).  Same un-normalized GraphX conventions as
    :func:`pagerank` (dangling mass dropped, rank_0 = 1.0); duplicate
    (src, dst) rows have their weights SUMMED first, so the result is
    invariant to how the weight mass is split across input rows.

    The host graph's ``n_links`` column is the intended weight: a host
    linked 50× from one page-heavy neighbor should outrank one linked
    once — the unweighted :func:`pagerank` treats both the same.

    Shuffle shape is identical to :func:`pagerank`: the weighted edge
    table (src, dst, w, W) is built once, repartitioned on src and
    pinned in the cache, so each iteration shuffles only the rank rows.
    """
    g = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("_w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("_w").alias("_w"))
        .persist()
    )
    if local_under:
        head = g.limit(local_under + 1).collect()
        if len(head) <= local_under:
            g.unpersist()
            return _local_rank_rows(
                edges.sparkSession,
                [(r["src"], r["dst"]) for r in head],
                [r["_w"] for r in head],
                damping,
                iterations,
                g.schema["src"].dataType,
            )
    nodes = (
        g.select(F.col("src").alias("entity_id"))
        .unionByName(g.select(F.col("dst").alias("entity_id")))
        .distinct()
        .persist()
    )
    outw = g.groupBy("src").agg(F.sum("_w").alias("_outw"))
    ge = g.join(outw, "src").repartition("src").persist()
    ge.count()

    ranks = nodes.select("entity_id", F.lit(1.0).alias("pagerank"))
    prev = None
    for i in range(iterations):
        contribs = (
            ge.join(
                ranks.select(F.col("entity_id").alias("src"), "pagerank"),
                "src",
            )
            .groupBy(F.col("dst").alias("entity_id"))
            .agg(
                F.sum(
                    F.col("pagerank") * F.col("_w") / F.col("_outw")
                ).alias("_mass")
            )
        )
        ranks = nodes.join(contribs, "entity_id", "left").select(
            "entity_id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("_mass", F.lit(0.0))
            ).alias("pagerank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = ranks
    g.unpersist()
    nodes.unpersist()
    ge.unpersist()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds,
    src: str = "subj_id",
    dst: str = "obj_id",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
    local_under: int | None = None,
) -> DataFrame:
    """Personalized PageRank: random walk with restart onto the seed
    set — the graph-walk retrieval primitive (HippoRAG-style) behind
    'entities relevant to THIS query', where global :func:`pagerank`
    answers 'entities important overall'.  The reference's analogue is
    the seeded Cypher expansion it runs around query entities
    (retrieval.py:281-290); PPR is its principled multi-hop weighting.

    Deterministic contract (shared with the unrolled DuckDB twin):
    DISTINCT directed edges; restart(v) = 1/|S| for seed entities, 0
    otherwise; r_0 = restart; r_{k+1}(v) = (1-d)·restart(v) +
    d·Σ_{u→v} r_k(u)/outdeg(u); dangling mass dropped (the same
    un-normalized GraphX convention :func:`pagerank` uses).  Seeds not
    present in the graph still carry their restart mass (they walk
    nowhere, matching the SQL twin's LEFT JOIN).  Returns (entity_id,
    ppr) for entities with ppr > 0 — on a web-scale KG the nonzero set
    is the seed neighborhood, not the graph.

    Plan shape: identical to :func:`pagerank` — the (src, dst, outdeg)
    table is repartitioned on src and persisted once, each iteration
    shuffles only rank-sized rows, lineage is cut every
    ``checkpoint_every`` iterations.

    ``local_under``: scale-adaptive dispatch, same design as
    :func:`pagerank`'s — when BOTH the distinct edge list and the seed
    set fit under the gate (two bounded limit(n+1) probes, never an
    unbounded collect), the walk runs driver-local in numpy.  The
    webgraph trust-rank wrappers use it: a host graph is orders of
    magnitude smaller than its corpus."""
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = spark.createDataFrame(
            [(str(s),) for s in seeds], "entity_id string"
        )
    else:
        seeds = seeds.select(F.col(seeds.columns[0]).alias("entity_id"))
    seeds = seeds.distinct().persist()
    n_seeds = seeds.count()
    if n_seeds == 0:
        seeds.unpersist()
        return spark.createDataFrame([], "entity_id string, ppr double")

    g = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    if local_under:
        head = g.limit(local_under + 1).collect()
        if len(head) <= local_under:
            seed_head = seeds.limit(local_under + 1).collect()
            if len(seed_head) <= local_under:
                g.unpersist()
                out = _local_ppr_rows(
                    spark,
                    [(r["src"], r["dst"]) for r in head],
                    [r["entity_id"] for r in seed_head],
                    damping,
                    iterations,
                    g.schema["src"].dataType,
                )
                seeds.unpersist()
                return out
    nodes = (
        g.select(F.col("src").alias("entity_id"))
        .unionByName(g.select(F.col("dst").alias("entity_id")))
        .unionByName(seeds)
        .distinct()
        .persist()
    )
    outdeg = g.groupBy("src").agg(F.count("*").alias("_outdeg"))
    ge = g.join(outdeg, "src").repartition("src").persist()
    ge.count()

    restart = nodes.join(
        seeds.withColumn("_r", F.lit(1.0 / n_seeds)), "entity_id", "left"
    ).select("entity_id", F.coalesce("_r", F.lit(0.0)).alias("_restart"))
    restart = restart.persist()
    restart.count()

    ranks = restart.select("entity_id", F.col("_restart").alias("pagerank"))
    prev = None
    for i in range(iterations):
        contribs = _iteration_contribs(ge, ranks)
        ranks = restart.join(contribs, "entity_id", "left").select(
            "entity_id",
            (
                F.lit(1.0 - damping) * F.col("_restart")
                + F.lit(damping) * F.coalesce("_mass", F.lit(0.0))
            ).alias("pagerank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = ranks
    if iterations == 0:
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.filter(F.col("pagerank") > 0.0).select(
        "entity_id", F.col("pagerank").alias("ppr")
    )
    g.unpersist()
    nodes.unpersist()
    ge.unpersist()
    restart.unpersist()
    seeds.unpersist()
    return out


def _local_hits_rows(spark, pairs, iterations, id_type):
    """Driver-local HITS over a collected (bounded) edge list — same
    iteration contract as the distributed loop in :func:`hits`."""
    import numpy as np
    from pyspark.sql import types as T

    nodes = sorted({p[0] for p in pairs} | {p[1] for p in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    srcs = np.array([idx[s] for s, _ in pairs], dtype=np.int64)
    dsts = np.array([idx[d] for _, d in pairs], dtype=np.int64)
    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(iterations):
        a = np.zeros(len(nodes))
        np.add.at(a, dsts, h[srcs])
        s = a.sum()
        if s > 0:
            a /= s
        h = np.zeros(len(nodes))
        np.add.at(h, srcs, a[dsts])
        s = h.sum()
        if s > 0:
            h /= s
    schema = T.StructType(
        [
            T.StructField("entity_id", id_type, True),
            T.StructField("hub", T.DoubleType(), True),
            T.StructField("authority", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(n, float(h[idx[n]]), float(a[idx[n]])) for n in nodes], schema
    )


def hits(
    edges: DataFrame,
    src: str = "subj_id",
    dst: str = "obj_id",
    iterations: int = 10,
    checkpoint_every: int = 1,
    local_under: int | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over DISTINCT
    directed edges: (entity_id, hub, authority).

    Deterministic contract (shared with the unrolled DuckDB twin and
    the numpy local path): h_0 = 1 for every node; each iteration
    computes a_k(v) = Σ_{u→v} h_{k-1}(u) then L1-normalizes a_k to sum
    1, then h_k(u) = Σ_{u→v} a_k(v) and L1-normalizes h_k.  L1 instead
    of the textbook L2 keeps the normalizer a plain SUM on both
    engines; the RANKING is identical (normalization only rescales).
    Nodes with no out-links end with hub 0; no in-links, authority 0 —
    every node keeps a row.

    Where :func:`pagerank` scores endorsement mass, the authority score
    rewards being pointed at BY GOOD HUBS — on a web host graph, hubs
    are directories/aggregators and authorities are the content hosts a
    crawl frontier should prioritize.

    Plan shape: the distinct (src, dst) table is persisted once; each
    iteration is two rank-sized shuffles (join + groupBy sum) and two
    one-row global sums broadcast back — never a corpus scan.  Unlike
    the PageRank loop, BOTH score vectors are consumed twice per
    iteration (mass join + normalizer sum), so lineage doubles per
    iteration — checkpoint_every defaults to 1 (a 4-iteration gap grows
    the uncut plan ~2^4 and was observed exploding the stage count).
    ``local_under`` dispatches a bounded driver-local numpy loop like
    the other rank operators (host graphs ≪ corpus)."""
    if iterations < 1:
        raise ValueError("hits needs iterations >= 1")
    g = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    if local_under:
        head = g.limit(local_under + 1).collect()
        if len(head) <= local_under:
            g.unpersist()
            return _local_hits_rows(
                edges.sparkSession,
                [(r["src"], r["dst"]) for r in head],
                iterations,
                g.schema["src"].dataType,
            )
    nodes = (
        g.select(F.col("src").alias("entity_id"))
        .unionByName(g.select(F.col("dst").alias("entity_id")))
        .distinct()
        .persist()
    )
    g.count()

    def _norm(df: DataFrame, col: str) -> DataFrame:
        s = df.agg(F.sum(col).alias("_s"))
        return (
            df.crossJoin(F.broadcast(s))
            .select(
                "entity_id",
                F.when(F.col("_s") > 0.0, F.col(col) / F.col("_s"))
                .otherwise(F.lit(0.0))
                .alias(col),
            )
        )

    h = nodes.select("entity_id", F.lit(1.0).alias("hub"))
    a = None
    prev = None
    for i in range(iterations):
        a_mass = (
            g.join(h.select(F.col("entity_id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("entity_id"))
            .agg(F.sum("hub").alias("authority"))
        )
        a = _norm(
            nodes.join(a_mass, "entity_id", "left").select(
                "entity_id",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        )
        h_mass = (
            g.join(
                a.select(F.col("entity_id").alias("dst"), "authority"), "dst"
            )
            .groupBy(F.col("src").alias("entity_id"))
            .agg(F.sum("authority").alias("hub"))
        )
        h = _norm(
            nodes.join(h_mass, "entity_id", "left").select(
                "entity_id", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            h = h.localCheckpoint(eager=True)
            a = a.localCheckpoint(eager=True)
            if prev is not None:
                prev[0].unpersist()
                prev[1].unpersist()
            prev = (h, a)
    out = h.join(a, "entity_id").select("entity_id", "hub", "authority")
    out = out.localCheckpoint(eager=True)
    if prev is not None:
        # ADVICE r5: the final iteration's checkpointed h/a were held in
        # prev and never released — two extra materialized score vectors
        # per call until the ContextCleaner got to them
        prev[0].unpersist()
        prev[1].unpersist()
    g.unpersist()
    nodes.unpersist()
    return out


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """DISTINCT pairs with both directions materialized — the adjacency
    a 'neighbors' walk needs when the stored edges are directed (the
    reference's RELATES_TO edges are; its Cypher walks both ways with
    an undirected pattern)."""
    g = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return g.unionByName(
        g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def khop_neighbors(
    edges: DataFrame,
    seeds,
    k: int = 2,
    src: str = "subj_id",
    dst: str = "obj_id",
    undirected: bool = True,
) -> DataFrame:
    """Min-hop distance (≤ k) from any seed entity — the multi-hop
    neighborhood expansion the reference would run as a variable-length
    Cypher pattern (``MATCH (e {name: $n})-[*..k]-(m)``) over its
    single-node Neo4j store (reference retrieval.py:281-290 is the
    1-hop case).  Returns (entity_id, hop) with hop = the BFS level the
    entity was first reached at (seeds are hop 0, present even if
    isolated).

    Frontier BFS as joins: the deduped adjacency is repartitioned on
    ``src`` and persisted ONCE, so each hop shuffles only the frontier
    (typically tiny vs. the edge table); the visited set grows by
    anti-join, so no entity is ever expanded twice — on a 100 TB graph
    the work per hop is O(frontier ⋈ edges), not O(k × edges).
    ``localCheckpoint`` after each hop keeps the plan O(1)-deep.
    Early-exits when a frontier drains (the per-hop count is on an
    already-materialized checkpoint, so it is free)."""
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = spark.createDataFrame([(str(s),) for s in seeds], "entity_id string")
    else:
        seeds = seeds.select(F.col(seeds.columns[0]).alias("entity_id"))
    if undirected:
        g = _undirected(edges, src, dst)
    else:
        g = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    g = g.repartition("src").persist()

    visited = (
        seeds.distinct()
        .select("entity_id", F.lit(0).alias("hop"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("entity_id")
    for i in range(1, k + 1):
        nxt = (
            g.join(frontier.withColumnRenamed("entity_id", "src"), "src")
            .select(F.col("dst").alias("entity_id"))
            .distinct()
            .join(visited.select("entity_id"), "entity_id", "left_anti")
            .select("entity_id", F.lit(i).alias("hop"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("entity_id")
    g.unpersist()
    return visited


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "subj_id",
    dst: str = "obj_id",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Community detection by synchronous label propagation over the
    undirected entity graph — the structure a GraphRAG uses for
    global/community-level summarization, which connected components
    (operators/components.py) cannot give on a well-connected KG (one
    giant component ≠ one community).

    Deterministic contract (shared with the unrolled DuckDB twin):
    adjacency = DISTINCT undirected pairs (self-loops kept — a node
    votes for itself exactly when the KG stores a reflexive edge);
    ``label_0(v) = v``; each iteration every node adopts the most
    frequent label among its neighbors, ties broken by MIN label; a
    node with no neighbors keeps its label.  Fixed iteration count —
    synchronous LPA can 2-cycle on bipartite structures, so convergence
    detection is deliberately not the stop rule on either engine.

    Per-iteration cost: one shuffle of (dst, label) partials (map-side
    combined) + a per-node window over its (small) label histogram; the
    adjacency is repartitioned on ``src`` and persisted once, so —
    like :func:`pagerank` — iterations shuffle only label-sized data,
    never the edge table."""
    g = _undirected(edges, src, dst).repartition("src").persist()
    nodes = g.select(F.col("src").alias("entity_id")).distinct().persist()
    nodes.count()

    labels = nodes.select("entity_id", F.col("entity_id").alias("label"))
    prev = None
    w = Window.partitionBy("entity_id").orderBy(F.desc("_c"), F.asc("label"))
    for i in range(iterations):
        votes = (
            g.join(
                labels.select(F.col("entity_id").alias("src"), "label"), "src"
            )
            .groupBy(F.col("dst").alias("entity_id"), "label")
            .agg(F.count("*").alias("_c"))
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("entity_id", F.col("label").alias("_new"))
        )
        labels = labels.join(top, "entity_id", "left").select(
            "entity_id", F.coalesce("_new", "label").alias("label")
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            labels = labels.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = labels
    g.unpersist()
    nodes.unpersist()
    return labels


def community_chunks(
    labels: DataFrame,
    entities: DataFrame,
    mentions: DataFrame,
    top_k: int = 5,
) -> DataFrame:
    """Top chunks per community — the retrieval join behind GraphRAG
    'global search': :func:`label_propagation` labels → member entities
    → the chunks that mention them, ranked by how many distinct member
    entities each chunk mentions.  A summarizer reads the top chunks of
    each community instead of the whole corpus (the reference's Neo4j
    KG has the same information one Cypher aggregation away; at 100 TB
    this is the distributed form).

    Inputs: ``labels(entity_id, label)``; ``entities(name,
    canonical_id, ...)`` (the KG's surface-form → canonical-id map);
    ``mentions(chunk_id, entity_name)``.  Returns (label, chunk_id,
    n_entities) with ≤ top_k chunks per label, ties by chunk_id asc.

    Plan shape: two hash joins on entity keys (the entities map is
    small relative to mentions — Spark broadcasts it under AQE; the
    mentions join shuffles on entity_name once), a map-side-combined
    count-distinct per (label, chunk_id), and a per-label top-k rank
    window — no driver-side state."""
    member = labels.join(
        entities.select(
            F.col("name").alias("entity_name"),
            F.col("canonical_id").alias("entity_id"),
        ),
        "entity_id",
    )
    per_chunk = (
        mentions.join(member, "entity_name")
        .groupBy("label", "chunk_id")
        .agg(F.count_distinct("entity_id").alias("n_entities"))
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("n_entities"), F.asc("chunk_id")
    )
    return (
        per_chunk.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def personalized_pagerank_many(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "subj_id",
    dst: str = "obj_id",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Batch twin of :func:`personalized_pagerank`: ``seeds(query_id,
    entity_id)`` carries every query's seed set, and ONE iteration plan
    answers all of them — an evaluation set of 10k query neighborhoods
    is one job, not 10k (the same batch doctrine as
    ``term_search_many`` / ``ivf_index_topk_many``).

    Identical per-query contract to the single-seed operator (restart =
    1/|S_q|, r_0 = restart, dangling mass dropped, nonzero rows only) —
    pytest-gated equal to N independent calls.

    Scale shape: the rank state is SPARSE — (query_id, entity_id) rows
    exist only where ppr > 0, i.e. each query's reachable neighborhood,
    never |V|×|Q|.  Each iteration joins the rank state against the
    once-persisted (src, dst, outdeg) table and reduces mass with a
    map-side-combined sum keyed by (query_id, dst); the full-outer join
    with the restart table re-injects seed mass.  Lineage is cut every
    ``checkpoint_every`` iterations like the single-query form."""
    spark = edges.sparkSession
    seeds = seeds.select(
        F.col(seeds.columns[0]).alias("query_id"),
        F.col(seeds.columns[1]).alias("entity_id"),
    ).distinct()

    g = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    outdeg = g.groupBy("src").agg(F.count("*").alias("_outdeg"))
    ge = g.join(outdeg, "src").repartition("src").persist()
    ge.count()

    w_n = Window.partitionBy("query_id")
    restart = seeds.withColumn(
        "_restart", F.lit(1.0) / F.count("*").over(w_n)
    ).persist()
    restart.count()

    ranks = restart.select(
        "query_id", "entity_id", F.col("_restart").alias("pagerank")
    )
    prev = None
    for i in range(iterations):
        mass = (
            ge.join(
                ranks.select(
                    "query_id",
                    F.col("entity_id").alias("src"),
                    "pagerank",
                ),
                "src",
            )
            .groupBy("query_id", F.col("dst").alias("entity_id"))
            .agg(F.sum(F.col("pagerank") / F.col("_outdeg")).alias("_mass"))
        )
        ranks = (
            restart.select("query_id", "entity_id", "_restart")
            .join(mass, ["query_id", "entity_id"], "full_outer")
            .select(
                "query_id",
                "entity_id",
                (
                    F.lit(1.0 - damping)
                    * F.coalesce("_restart", F.lit(0.0))
                    + F.lit(damping) * F.coalesce("_mass", F.lit(0.0))
                ).alias("pagerank"),
            )
            .filter(F.col("pagerank") > 0.0)
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = ranks
    if iterations == 0:
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("query_id", "entity_id", F.col("pagerank").alias("ppr"))
    g.unpersist()
    ge.unpersist()
    restart.unpersist()
    return out


def triangle_counts(
    edges: DataFrame,
    src: str = "subj_id",
    dst: str = "obj_id",
) -> DataFrame:
    """Per-entity triangle participation + local clustering coefficient
    over the undirected simple graph (self-loops dropped, multi-edges
    collapsed) — the standard cohesion analytic (how clique-ish is an
    entity's neighborhood) that a Neo4j user gets from the GDS
    triangleCount procedure.

    Returns (entity_id, degree, n_triangles, clustering) for every
    entity with degree ≥ 1; ``clustering`` = 2·t / (d·(d−1)) rounded to
    6dp, 0.0 when d < 2.

    Scale shape: the classic degree-ordered orientation — every
    undirected edge points from the (degree, id)-smaller endpoint to
    the larger, so each triangle is enumerated EXACTLY once and, more
    importantly, wedge enumeration fans out from the low-degree side: a
    crawl-graph hub with 10^6 neighbors contributes no wedge pairs from
    its own adjacency (everything points INTO it), which is what keeps
    the intermediate wedge table near Σ min-degree² instead of Σ
    degree².  Two shuffled hash joins + one count; no driver state.
    The result is orientation-invariant, so the DuckDB twin can use
    plain lexical orientation and still match row-for-row."""
    p = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        p.select(F.col("a").alias("entity_id"))
        .unionByName(p.select(F.col("b").alias("entity_id")))
        .groupBy("entity_id")
        .agg(F.count("*").alias("degree"))
        .persist()
    )
    deg.count()

    # orient by (degree, id): u -> v iff rank(u) < rank(v)
    da = deg.select(F.col("entity_id").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("entity_id").alias("b"), F.col("degree").alias("_db"))
    ranked = p.join(da, "a").join(db, "b")
    ra = F.struct(F.col("_da").alias("d"), F.col("a").alias("i"))
    rb = F.struct(F.col("_db").alias("d"), F.col("b").alias("i"))
    fwd = ra < rb
    oe = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, rb).otherwise(ra).alias("_rv"),
    ).persist()
    oe.count()

    e1 = oe.select(F.col("u"), F.col("v").alias("x"), F.col("_rv").alias("_rx"))
    e2 = oe.select(F.col("u"), F.col("v").alias("y"), F.col("_rv").alias("_ry"))
    wedges = e1.join(e2, "u").filter(F.col("_rx") < F.col("_ry"))
    tri = wedges.join(
        oe.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    ).select("u", "x", "y")

    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("entity_id"))
        .groupBy("entity_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    out = (
        deg.join(per_node, "entity_id", "left")
        .select(
            "entity_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
        .localCheckpoint(eager=True)
    )
    p.unpersist()
    deg.unpersist()
    oe.unpersist()
    return out


def entity_cooccurrence(
    mentions: DataFrame,
    entity_map: DataFrame,
    min_count: int = 1,
    max_entities_per_chunk: int | None = None,
) -> DataFrame:
    """Entity co-occurrence statistics with PMI over chunk contexts —
    the association-mining analytic a KG builder runs to find related
    entities the extracted triples MISSED (two names that keep
    appearing in the same chunks but never in one sentence).  The
    reference's Neo4j graph only knows asserted edges; this recovers
    the latent ones from mention co-location.

    Inputs: ``mentions(chunk_id, entity_name)``; ``entity_map(name,
    canonical_id)`` (surface form → canonical id, so aliases of one
    entity count as the same node).  Returns (entity_a, entity_b,
    n_ab, n_a, n_b, pmi) for unordered pairs with entity_a < entity_b
    and n_ab ≥ min_count; pmi = ln(n_ab·N / (n_a·n_b)) at 6dp where N
    = number of chunks with ≥1 linked entity and n_x = chunks
    containing x.

    Scale shape: the pair fan-out is the quadratic hazard — a
    boilerplate chunk mentioning 500 entities yields 125k pairs.
    ``max_entities_per_chunk`` DROPS such chunks whole (deterministic,
    and statistically right: listing pages poison PMI).  With the cap
    on, the self-join on chunk_id is bounded by cap² per chunk; the
    (a, b) count is map-side combined, and chunk_id is
    high-cardinality so the join itself has no skewed key.  N and n_x
    are one partial-agg pass each.  No UDFs, no driver state."""
    cm = (
        mentions.join(
            entity_map.select(
                F.col("name").alias("entity_name"),
                F.col("canonical_id").alias("entity_id"),
            ),
            "entity_name",
        )
        .select("chunk_id", "entity_id")
        .distinct()
    )
    if max_entities_per_chunk is not None:
        sizes = cm.groupBy("chunk_id").agg(F.count("*").alias("_sz"))
        cm = cm.join(
            sizes.filter(F.col("_sz") <= max_entities_per_chunk).select(
                "chunk_id"
            ),
            "chunk_id",
            "left_semi",
        )
    cm = cm.persist()
    n_total = cm.select("chunk_id").distinct().count()

    per_entity = cm.groupBy("entity_id").agg(F.count("*").alias("_n"))
    left = cm.select("chunk_id", F.col("entity_id").alias("entity_a"))
    right = cm.select("chunk_id", F.col("entity_id").alias("entity_b"))
    pairs = (
        left.join(right, "chunk_id")
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    na = per_entity.select(
        F.col("entity_id").alias("entity_a"), F.col("_n").alias("n_a")
    )
    nb = per_entity.select(
        F.col("entity_id").alias("entity_b"), F.col("_n").alias("n_b")
    )
    out = (
        pairs.join(na, "entity_a")
        .join(nb, "entity_b")
        .select(
            "entity_a",
            "entity_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.lit(float(n_total))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .localCheckpoint(eager=True)
    )
    cm.unpersist()
    return out


def community_triples(
    labels: DataFrame,
    edges: DataFrame,
    top_k: int = 5,
) -> DataFrame:
    """Top supported triples per community — the deterministic core of
    a GraphRAG 'community report': for each label-propagation
    community, the intra-community (subj, pred, obj) facts ranked by
    how many distinct chunks assert them.  A summarizer (LLM in the
    reference's world) reads these instead of the whole community's
    text; :func:`community_chunks` gives it the prose, this gives it
    the structured claims.

    Inputs: ``labels(entity_id, label)``; ``edges(subj_id, pred,
    obj_id, chunk_id, ...)`` (the canonical edge table, one row per
    asserting chunk).  Returns (label, subj_id, pred, obj_id, support)
    with ≤ top_k triples per label — only edges whose BOTH endpoints
    share the label count (cross-community edges belong to no single
    community's report); ties break on (subj_id, pred, obj_id) asc.

    Plan shape: two hash joins against the (small) label table — under
    AQE these broadcast; the support count is a map-side-combined
    distinct over (label, triple, chunk); the rank is one per-label
    window.  At 100 TB the window's partition is a community's triple
    set — bounded by the community, not the corpus."""
    ls = labels.select(
        F.col("entity_id").alias("subj_id"), F.col("label").alias("_ls")
    )
    lo = labels.select(
        F.col("entity_id").alias("obj_id"), F.col("label").alias("_lo")
    )
    intra = (
        edges.join(ls, "subj_id")
        .join(lo, "obj_id")
        .filter(F.col("_ls") == F.col("_lo"))
        .select(
            F.col("_ls").alias("label"),
            "subj_id",
            "pred",
            "obj_id",
            "chunk_id",
        )
    )
    support = intra.groupBy("label", "subj_id", "pred", "obj_id").agg(
        F.count_distinct("chunk_id").alias("support")
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("support"),
        F.asc("subj_id"),
        F.asc("pred"),
        F.asc("obj_id"),
    )
    return (
        support.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def shortest_path(
    edges: DataFrame,
    src_entity: str,
    dst_entity: str,
    max_hops: int = 6,
    src: str = "subj_id",
    dst: str = "obj_id",
    undirected: bool = True,
) -> DataFrame:
    """Min-hop path between two entities — the reference's Neo4j
    answers this with ``MATCH p = shortestPath((a)-[*..k]-(b))``; over
    a distributed edge DataFrame it is path-carrying frontier BFS.

    Returns ONE row (hops, path:array<string>) — the lexicographically
    smallest among the min-hop paths, so the result is deterministic on
    both engines — or zero rows when dst is unreachable within
    ``max_hops``.  hops = 0 with path [src] when src == dst.

    Scale shape: identical to :func:`khop_neighbors` (adjacency
    repartitioned + persisted once, per-hop work = frontier ⋈ edges,
    visited anti-join, lineage cut per hop) with one addition: the
    frontier carries each node's min path as an array column, reduced
    per node with ``F.min`` (Spark arrays order lexicographically).
    Path length is bounded by max_hops, so the array column stays
    O(max_hops) bytes — the frontier never holds more than one path
    per node.  Early-exits the hop AFTER dst is reached (the reached
    check rides on the already-materialized checkpoint)."""
    spark = edges.sparkSession
    a, b = str(src_entity), str(dst_entity)
    if undirected:
        g = _undirected(edges, src, dst)
    else:
        g = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).distinct()
    g = g.repartition("src").persist()

    frontier = spark.createDataFrame(
        [(a, [a])], "entity_id string, path array<string>"
    ).localCheckpoint(eager=True)
    visited = frontier.select("entity_id")
    hit = frontier.filter(F.col("entity_id") == b)
    hops = 0
    while hit.isEmpty() and hops < max_hops:
        frontier = (
            g.join(frontier.withColumnRenamed("entity_id", "src"), "src")
            .select(
                F.col("dst").alias("entity_id"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
            .join(visited, "entity_id", "left_anti")
            .groupBy("entity_id")
            .agg(F.min("path").alias("path"))
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        hops += 1
        visited = (
            visited.unionByName(frontier.select("entity_id"))
            .localCheckpoint(eager=True)
        )
        hit = frontier.filter(F.col("entity_id") == b)
    g.unpersist()
    return hit.select(F.lit(hops).alias("hops"), "path")


def graph_summary(
    edges: DataFrame, src: str = "subj_id", dst: str = "obj_id"
) -> DataFrame:
    """One-row health profile of the entity graph: node/edge counts,
    density, and the degree distribution's shape (max / mean / p50 /
    p90 / p99 over total degree of the DISTINCT directed simple graph)
    — the first thing an operator reads after a crawl lands, and the
    numbers that decide skew strategy (a p99/mean ratio in the
    hundreds means the salted/hub-capped paths matter).

    Two partial-agg passes over the distinct edge set (one for counts,
    one over per-node degrees); percentiles via the exact
    ``percentile`` aggregate so the DuckDB twin can match hash-exact.
    At 100 TB swap in ``percentile_approx`` — disclosed here rather
    than silently approximated at test scale."""
    g = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    deg = (
        g.select(F.col("src").alias("entity_id"))
        .unionByName(g.select(F.col("dst").alias("entity_id")))
        .groupBy("entity_id")
        .agg(F.count("*").alias("degree"))
    )
    n_edges = g.count()
    return deg.agg(
        F.count("*").alias("n_nodes"),
        F.lit(n_edges).alias("n_edges"),
        F.round(
            F.lit(float(n_edges))
            / (F.count("*") * (F.count("*") - F.lit(1))),
            9,
        ).alias("density"),
        F.max("degree").alias("max_degree"),
        F.round(F.avg("degree"), 6).alias("avg_degree"),
        F.expr("percentile(degree, 0.5)").alias("p50_degree"),
        F.expr("percentile(degree, 0.9)").alias("p90_degree"),
        F.expr("percentile(degree, 0.99)").alias("p99_degree"),
    )
