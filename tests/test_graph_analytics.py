"""degree_centrality / pagerank vs a pure-Python reference on crafted
graphs (multi-edges, self-loops, dangling nodes, disconnected parts)."""

import pytest

from hybrid_graphrag_with_qdrant_neo4j_spark.operators import graph_analytics as ga


def _pagerank_py(pairs, damping=0.85, iterations=10):
    g = sorted(set(pairs))
    nodes = sorted({a for a, _ in g} | {b for _, b in g})
    outdeg = {}
    for a, _ in g:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        mass = {n: 0.0 for n in nodes}
        for a, b in g:
            mass[b] += rank[a] / outdeg[a]
        rank = {n: (1.0 - damping) + damping * mass[n] for n in nodes}
    return rank


# multi-edge a->b (collapses), self-loop c->c, dangling sink d,
# disconnected pair e->f
_PAIRS = [
    ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
    ("c", "a"), ("c", "c"), ("b", "d"), ("e", "f"),
]


@pytest.fixture(scope="module")
def edges(spark):
    rows = [(s, "REL", o, f"ch{i}", "u") for i, (s, o) in enumerate(_PAIRS)]
    return spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, chunk_id string, url string"
    )


def test_degree_centrality_matches_reference(edges):
    got = {
        r["entity_id"]: (r["out_degree"], r["in_degree"], r["degree"])
        for r in ga.degree_centrality(edges).collect()
    }
    g = sorted(set((s, o) for s, o in _PAIRS))
    nodes = {a for a, _ in g} | {b for _, b in g}
    want = {
        n: (
            sum(1 for a, _ in g if a == n),
            sum(1 for _, b in g if b == n),
            sum(1 for a, _ in g if a == n) + sum(1 for _, b in g if b == n),
        )
        for n in nodes
    }
    assert got == want


def test_pagerank_matches_reference(edges):
    got = {
        r["entity_id"]: r["pagerank"] for r in ga.pagerank(edges).collect()
    }
    want = _pagerank_py(set(_PAIRS))
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9), n


def test_pagerank_star_hub_outranks_leaves(spark):
    rows = [(f"leaf{i}", "REL", "hub", f"c{i}", "u") for i in range(5)]
    rows.append(("hub", "REL", "leaf0", "c9", "u"))
    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, chunk_id string, url string"
    )
    ranks = {r["entity_id"]: r["pagerank"] for r in ga.pagerank(edges).collect()}
    # hub beats every leaf that receives nothing (leaf0 receives the
    # hub's ENTIRE out-mass — outdeg(hub)=1 — so it rivals the hub;
    # the hub/leaf0 2-cycle also oscillates at finite iterations)
    for i in range(1, 5):
        assert ranks["hub"] > ranks[f"leaf{i}"]
    assert ranks == {
        k: pytest.approx(v, abs=1e-9)
        for k, v in _pagerank_py(
            [(f"leaf{i}", "hub") for i in range(5)] + [("hub", "leaf0")]
        ).items()
    }


def test_pagerank_zero_iterations_is_initial_rank(edges):
    got = {r["entity_id"]: r["pagerank"]
           for r in ga.pagerank(edges, iterations=0).collect()}
    assert set(got.values()) == {1.0}


def test_cli_analytics_verb(spark, tmp_path_factory, monkeypatch, capsys):
    """`run_pipeline.py analytics --kg-dir ...` end-to-end over a small
    built KG: JSON output with top entities carrying pagerank + degrees."""
    import json

    import run_pipeline
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path_factory.mktemp("kg_an"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="an:40")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "analytics", "--kg-dir", out, "--top", "3"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["n_entities"] > 0
    assert 1 <= len(got["top"]) <= 3
    rec = got["top"][0]
    assert set(rec) == {"entity_id", "pagerank", "in_degree", "out_degree"}
    assert rec["pagerank"] >= got["top"][-1]["pagerank"]


def test_pagerank_randomized_graphs_vs_python_oracle(spark):
    """Seeded sweep of random digraphs (varying density, self-loops,
    duplicate edges) against the pure-Python reference."""
    import random

    rng = random.Random(17)
    for trial in range(4):
        n = rng.randint(2, 12)
        m = rng.randint(1, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        got = {
            r["entity_id"]: r["pagerank"]
            for r in ga.pagerank(edges, iterations=6).collect()
        }
        want = _pagerank_py(set(pairs), iterations=6)
        assert set(got) == set(want), f"trial={trial}"
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (trial, k)


def _khop_py(pairs, seeds, k, undirected=True):
    adj = {}
    for a, b in set(pairs):
        adj.setdefault(a, set()).add(b)
        if undirected:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, k + 1):
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        nxt -= dist.keys()
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    return dist


def _lpa_py(pairs, iterations):
    adj = {}
    for a, b in set(pairs):
        adj.setdefault(a, []).append(b)
        if a != b:
            adj.setdefault(b, []).append(a)
    # dedup both directions the way _undirected's DISTINCT does
    adj = {v: sorted(set(ns)) for v, ns in adj.items()}
    labels = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v, ns in adj.items():
            counts = {}
            for n in ns:
                counts[labels[n]] = counts.get(labels[n], 0) + 1
            best = min(counts, key=lambda l: (-counts[l], l))
            new[v] = best
        labels = new
    return labels


def test_khop_matches_reference(edges):
    for k in (0, 1, 2, 3):
        got = {
            r["entity_id"]: r["hop"]
            for r in ga.khop_neighbors(edges, ["a"], k=k).collect()
        }
        assert got == _khop_py(_PAIRS, ["a"], k), k


def test_khop_directed_and_multi_seed(edges):
    got = {
        r["entity_id"]: r["hop"]
        for r in ga.khop_neighbors(edges, ["a", "e"], k=2, undirected=False).collect()
    }
    assert got == _khop_py(_PAIRS, ["a", "e"], 2, undirected=False)


def test_khop_isolated_seed_is_hop_zero(edges):
    got = {
        r["entity_id"]: r["hop"]
        for r in ga.khop_neighbors(edges, ["zzz"], k=3).collect()
    }
    assert got == {"zzz": 0}


def test_khop_randomized_vs_python_oracle(spark):
    import random

    rng = random.Random(23)
    for trial in range(4):
        n = rng.randint(3, 14)
        m = rng.randint(2, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        seeds = [f"n{rng.randrange(n)}"]
        k = rng.randint(1, 4)
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        got = {
            r["entity_id"]: r["hop"]
            for r in ga.khop_neighbors(edges, seeds, k=k).collect()
        }
        assert got == _khop_py(pairs, seeds, k), (trial, seeds, k)


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: LPA should settle each
    triangle on its own min label."""
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, chunk_id string, url string"
    )
    got = {
        r["entity_id"]: r["label"]
        for r in ga.label_propagation(edges, iterations=5).collect()
    }
    assert got == _lpa_py(pairs, 5)
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_label_propagation_randomized_vs_python_oracle(spark):
    import random

    rng = random.Random(41)
    for trial in range(4):
        n = rng.randint(3, 12)
        m = rng.randint(2, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        iters = rng.randint(1, 5)
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        got = {
            r["entity_id"]: r["label"]
            for r in ga.label_propagation(edges, iterations=iters).collect()
        }
        assert got == _lpa_py(pairs, iters), (trial, iters)


def test_pagerank_iteration_reuses_cached_edges(spark):
    """Plan gate: the per-iteration contribs plan must read the
    persisted (src, dst, outdeg) table from the cache (InMemoryTableScan
    with its pinned hashpartitioning(src)) instead of recomputing or
    reshuffling the edge table — at crawl scale the edge table dwarfs
    the rank vector, so reshuffling it every iteration is the failure
    mode this pins against."""
    from pyspark.sql import functions as F

    rows = [(f"a{i % 7}", "R", f"b{i % 5}", f"c{i}", "u") for i in range(50)]
    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, chunk_id string, url string"
    )
    g = edges.select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    ).distinct()
    outdeg = g.groupBy("src").agg(F.count("*").alias("_outdeg"))
    ge = g.join(outdeg, "src").repartition("src").persist()
    try:
        ge.count()
        ranks = (
            g.select(F.col("src").alias("entity_id"))
            .distinct()
            .select("entity_id", F.lit(1.0).alias("pagerank"))
            .localCheckpoint(eager=True)
        )
        plan = (
            ga._iteration_contribs(ge, ranks)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemoryTableScan" in plan, plan
    finally:
        ge.unpersist()


# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart onto a seed set)
# ---------------------------------------------------------------------------

def _ppr_py(pairs, seeds, damping=0.85, iterations=10):
    g = sorted(set(pairs))
    nodes = sorted({a for a, _ in g} | {b for _, b in g} | set(seeds))
    outdeg = {}
    for a, _ in g:
        outdeg[a] = outdeg.get(a, 0) + 1
    restart = {n: (1.0 / len(set(seeds)) if n in set(seeds) else 0.0) for n in nodes}
    rank = dict(restart)
    for _ in range(iterations):
        mass = {n: 0.0 for n in nodes}
        for a, b in g:
            mass[b] += rank[a] / outdeg[a]
        rank = {
            n: (1.0 - damping) * restart[n] + damping * mass[n] for n in nodes
        }
    return {n: r for n, r in rank.items() if r > 0.0}


def test_ppr_matches_reference(edges):
    got = {
        r["entity_id"]: r["ppr"]
        for r in ga.personalized_pagerank(edges, ["a"]).collect()
    }
    want = _ppr_py(_PAIRS, ["a"])
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n
    # the disconnected pair (e, f) must carry zero mass -> absent
    assert "e" not in got and "f" not in got


def test_ppr_multi_seed_and_foreign_seed(edges):
    """Two seeds split the restart mass; a seed absent from the graph
    keeps its restart mass but contributes nothing else."""
    got = {
        r["entity_id"]: r["ppr"]
        for r in ga.personalized_pagerank(edges, ["a", "zzz"]).collect()
    }
    want = _ppr_py(_PAIRS, ["a", "zzz"])
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n
    assert got["zzz"] == pytest.approx(0.15 * 0.5, abs=1e-12)


def test_ppr_empty_seeds(edges, spark):
    assert ga.personalized_pagerank(edges, []).count() == 0


def test_ppr_randomized_vs_python_oracle(spark):
    import random

    rng = random.Random(59)
    for trial in range(3):
        n = rng.randint(3, 12)
        m = rng.randint(2, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        seeds = sorted({f"n{rng.randrange(n)}" for _ in range(rng.randint(1, 3))})
        iters = rng.randint(1, 6)
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        got = {
            r["entity_id"]: r["ppr"]
            for r in ga.personalized_pagerank(
                edges, seeds, iterations=iters
            ).collect()
        }
        want = _ppr_py(pairs, seeds, iterations=iters)
        assert set(got) == set(want), (trial, seeds, iters)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12), (trial, k)


# ---------------------------------------------------------------------------
# Community top-chunks (global-search retrieval join)
# ---------------------------------------------------------------------------

def test_community_chunks(spark):
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("x", "x"), ("y", "x")],
        "entity_id string, label string",
    )
    entities = spark.createDataFrame(
        # two surface forms map to canonical 'a'
        [("a", "a"), ("a corp", "a"), ("b", "b"), ("x", "x"), ("y", "y")],
        "name string, canonical_id string",
    )
    mentions = spark.createDataFrame(
        [
            ("c1", "a"), ("c1", "a corp"), ("c1", "b"),  # c1: entities {a,b}
            ("c2", "a"),                                  # c2: {a}
            ("c3", "x"), ("c3", "y"),                     # c3: {x,y}
            ("c4", "y"),
        ],
        "chunk_id string, entity_name string",
    )
    got = {
        (r["label"], r["chunk_id"]): r["n_entities"]
        for r in ga.community_chunks(labels, entities, mentions, top_k=2).collect()
    }
    assert got == {
        ("a", "c1"): 2,  # 'a' (via two surface forms, counted once) + 'b'
        ("a", "c2"): 1,
        ("x", "c3"): 2,
        ("x", "c4"): 1,
    }


def test_community_chunks_top_k_tiebreak(spark):
    labels = spark.createDataFrame([("a", "a")], "entity_id string, label string")
    entities = spark.createDataFrame([("a", "a")], "name string, canonical_id string")
    mentions = spark.createDataFrame(
        [("c2", "a"), ("c1", "a"), ("c3", "a")], "chunk_id string, entity_name string"
    )
    rows = ga.community_chunks(labels, entities, mentions, top_k=2).collect()
    assert [(r["label"], r["chunk_id"]) for r in rows] == [("a", "c1"), ("a", "c2")]


def test_cli_analytics_seed_and_communities(spark, tmp_path_factory, monkeypatch, capsys):
    """analytics --seed + --communities: PPR neighborhood around the
    seed and label-propagation communities with their top chunks."""
    import json

    import run_pipeline
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path_factory.mktemp("kg_an2"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="an2:40")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "analytics", "--kg-dir", out, "--top", "3",
         "--seed", "Acme Corporation", "--communities"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    assert got["ppr_seed"] == "acme corporation"
    assert got["ppr_top"] and got["ppr_top"][0]["entity_id"] == "acme corporation"
    assert all(r["ppr"] > 0 for r in got["ppr_top"])
    assert got["n_communities"] >= 1
    comm = got["communities"][0]
    assert comm["n_members"] > 0 and comm["top_chunks"]
    assert comm["top_chunks"][0]["n_entities"] >= comm["top_chunks"][-1]["n_entities"]


def test_ppr_many_equals_per_query(edges, spark):
    """One sparse batch plan == N independent single-seed PPR calls
    (same nonzero row set, same scores)."""
    batches = {
        "q0": ["a"],
        "q1": ["a", "e"],
        "q2": ["zzz"],  # foreign seed: restart mass only
    }
    seeds = spark.createDataFrame(
        [(q, s) for q, ss in batches.items() for s in ss],
        "query_id string, entity_id string",
    )
    many = ga.personalized_pagerank_many(edges, seeds, iterations=6)
    got = {}
    for r in many.collect():
        got.setdefault(r["query_id"], {})[r["entity_id"]] = r["ppr"]
    for q, ss in batches.items():
        single = {
            r["entity_id"]: r["ppr"]
            for r in ga.personalized_pagerank(edges, ss, iterations=6).collect()
        }
        assert set(got.get(q, {})) == set(single), q
        for n, s in single.items():
            assert got[q][n] == pytest.approx(s, abs=1e-12), (q, n)


# ---------------------------------------------------------------------------
# Triangle counts / clustering coefficient
# ---------------------------------------------------------------------------

def _triangles_py(pairs):
    und = set()
    for a, b in pairs:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            # each of a node's triangles is seen twice via its two edges
            tri[a] += 1
            tri[b] += 1
    tri = {v: t // 2 for v, t in tri.items()}
    out = {}
    for v, ns in adj.items():
        d = len(ns)
        cc = round(2.0 * tri[v] / (d * (d - 1)), 6) if d >= 2 else 0.0
        out[v] = (d, tri[v], cc)
    return out


def test_triangle_counts_matches_reference(spark):
    # two triangles sharing edge (a,b), plus a pendant and a self-loop
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("a", "d"), ("b", "d"),
        ("d", "e"), ("x", "x"),
        ("b", "a"),  # reverse duplicate collapses
    ]
    rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, chunk_id string, url string"
    )
    got = {
        r["entity_id"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in ga.triangle_counts(edges).collect()
    }
    assert got == _triangles_py(pairs)
    assert got["a"] == (3, 2, round(2 * 2 / (3 * 2), 6))
    assert got["e"] == (1, 0, 0.0)
    assert "x" not in got  # self-loop-only node has no simple edges


def test_triangle_counts_randomized_vs_python_oracle(spark):
    import random

    rng = random.Random(71)
    for trial in range(4):
        n = rng.randint(3, 14)
        m = rng.randint(2, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        got = {
            r["entity_id"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in ga.triangle_counts(edges).collect()
        }
        assert got == _triangles_py(pairs), trial


# ---------------------------------------------------------------------------
# entity_cooccurrence
# ---------------------------------------------------------------------------

def _cooc_py(mention_rows, name_map, min_count=1, cap=None):
    """Pure-python PMI oracle over (chunk_id, entity_name) rows."""
    import math

    by_chunk = {}
    for ch, name in mention_rows:
        if name in name_map:
            by_chunk.setdefault(ch, set()).add(name_map[name])
    if cap is not None:
        by_chunk = {c: s for c, s in by_chunk.items() if len(s) <= cap}
    n_total = len(by_chunk)
    n = {}
    for s in by_chunk.values():
        for e in s:
            n[e] = n.get(e, 0) + 1
    pairs = {}
    for s in by_chunk.values():
        es = sorted(s)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pairs[(es[i], es[j])] = pairs.get((es[i], es[j]), 0) + 1
    out = {}
    for (a, b), nab in pairs.items():
        if nab >= min_count:
            pmi = round(math.log(nab * n_total / (n[a] * n[b])), 6)
            out[(a, b)] = (nab, n[a], n[b], pmi)
    return out


_COOC_MENTIONS = [
    # alias 'acme inc' maps onto 'acme' — co-occurrence must count it
    ("c1", "acme"), ("c1", "globex"),
    ("c2", "acme inc"), ("c2", "globex"), ("c2", "initech"),
    ("c3", "acme"), ("c3", "initech"),
    ("c4", "globex"),
    ("c5", "unlinked name"),            # not in the entity map: dropped
    ("c6", "acme"), ("c6", "acme inc"),  # same canonical twice: 1 entity
]
_COOC_MAP = {
    "acme": "acme", "acme inc": "acme",
    "globex": "globex", "initech": "initech",
}


def _cooc_dfs(spark):
    m = spark.createDataFrame(
        _COOC_MENTIONS, "chunk_id string, entity_name string"
    )
    em = spark.createDataFrame(
        list(_COOC_MAP.items()), "name string, canonical_id string"
    )
    return m, em


def test_entity_cooccurrence_matches_reference(spark):
    m, em = _cooc_dfs(spark)
    got = {
        (r["entity_a"], r["entity_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi"]
        )
        for r in ga.entity_cooccurrence(m, em).collect()
    }
    want = _cooc_py(_COOC_MENTIONS, _COOC_MAP)
    assert got == want
    # spot-check the alias fold: (acme, globex) co-occur in c1 AND c2
    assert got[("acme", "globex")][0] == 2


def test_entity_cooccurrence_min_count_and_cap(spark):
    m, em = _cooc_dfs(spark)
    got = {
        (r["entity_a"], r["entity_b"])
        for r in ga.entity_cooccurrence(m, em, min_count=2).collect()
    }
    want2 = {
        p for p, (nab, *_rest) in _cooc_py(_COOC_MENTIONS, _COOC_MAP).items()
        if nab >= 2
    }
    assert got == want2 == {("acme", "globex"), ("acme", "initech")}
    # cap=2 drops c2 (3 distinct canonical entities) entirely
    got_cap = {
        (r["entity_a"], r["entity_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi"]
        )
        for r in ga.entity_cooccurrence(
            m, em, max_entities_per_chunk=2
        ).collect()
    }
    assert got_cap == _cooc_py(_COOC_MENTIONS, _COOC_MAP, cap=2)
    assert got_cap[("acme", "globex")][0] == 1


def test_entity_cooccurrence_randomized_vs_python_oracle(spark):
    import random

    rnd = random.Random(77)
    ents = [f"e{i}" for i in range(12)]
    name_map = {e: e for e in ents}
    # aliases fold pairs of names onto one canonical id
    for i in range(0, 6, 2):
        name_map[f"alias{i}"] = ents[i]
    names = list(name_map)
    rows = [
        (f"c{rnd.randrange(20)}", rnd.choice(names)) for _ in range(150)
    ]
    m = spark.createDataFrame(rows, "chunk_id string, entity_name string")
    em = spark.createDataFrame(
        list(name_map.items()), "name string, canonical_id string"
    )
    got = {
        (r["entity_a"], r["entity_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi"]
        )
        for r in ga.entity_cooccurrence(m, em).collect()
    }
    assert got == _cooc_py(rows, name_map)


# ---------------------------------------------------------------------------
# community_triples
# ---------------------------------------------------------------------------

def test_community_triples_two_cliques(spark):
    # two 3-cliques bridged by one cross edge; the bridge triple must
    # appear in NO community's report
    tri = [
        ("a1", "knows", "a2", "c1"), ("a2", "knows", "a3", "c2"),
        ("a3", "knows", "a1", "c3"),
        # repeated assertion in two chunks -> support 2, ranks first
        ("a1", "leads", "a2", "c4"), ("a1", "leads", "a2", "c5"),
        ("b1", "knows", "b2", "c6"), ("b2", "knows", "b3", "c7"),
        ("b3", "knows", "b1", "c8"),
        ("a1", "bridges", "b1", "c9"),
    ]
    edges = spark.createDataFrame(
        [(s, p, o, c, "u") for s, p, o, c in tri],
        "subj_id string, pred string, obj_id string, chunk_id string, url string",
    )
    # hand-crafted labels: the operator contracts on ANY labels table
    # (LPA integration is covered by the scoreboard oracle query)
    lab = {"a1": "A", "a2": "A", "a3": "A", "b1": "B", "b2": "B", "b3": "B"}
    labels = spark.createDataFrame(
        list(lab.items()), "entity_id string, label string"
    )
    out = ga.community_triples(labels, edges, top_k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(
            (r["subj_id"], r["pred"], r["obj_id"], r["support"])
        )
    # no community contains the bridge edge
    assert all(
        (s, p, o) != ("a1", "bridges", "b1")
        for rows in by_label.values()
        for (s, p, o, _) in rows
    )
    # a-community: top triple is the support-2 'leads' fact
    a_rows = by_label[lab["a1"]]
    assert a_rows[0] == ("a1", "leads", "a2", 2) or (
        ("a1", "leads", "a2", 2) in a_rows and a_rows[0][3] == 2
    )
    assert all(len(rows) <= 2 for rows in by_label.values())
    # deterministic tie-break: support desc then triple asc
    for rows in by_label.values():
        keyed = [(-sup, s, p, o) for (s, p, o, sup) in rows]
        assert keyed == sorted(keyed)


def test_cli_analytics_triples_and_cooccurrence(
    spark, tmp_path_factory, monkeypatch, capsys
):
    """analytics --communities now carries top_triples (the structured
    community report) and --cooccurrence adds top PMI pairs."""
    import json

    import run_pipeline
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    out = str(tmp_path_factory.mktemp("kg_an3"))
    pages = corpus.pages_spark_df(spark, 40, partitions=4)
    build_kg(spark, pages, out, input_fingerprint="an3:40")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        "sys.argv",
        ["run_pipeline.py", "analytics", "--kg-dir", out, "--top", "3",
         "--communities", "--cooccurrence", "5"],
    )
    run_pipeline.main()
    got = json.loads(capsys.readouterr().out)
    comm = got["communities"][0]
    assert comm["top_triples"], "community report carries triples"
    t0 = comm["top_triples"][0]
    assert {"subj", "pred", "obj", "support"} <= set(t0)
    sups = [t["support"] for t in comm["top_triples"]]
    assert sups == sorted(sups, reverse=True)
    assert got["cooccurrence_top"], "PMI pairs present"
    assert all(r["n_ab"] >= 2 for r in got["cooccurrence_top"])
    pmis = [r["pmi"] for r in got["cooccurrence_top"]]
    assert pmis == sorted(pmis, reverse=True)
    assert all(
        r["entity_a"] < r["entity_b"] for r in got["cooccurrence_top"]
    )


# ---------------------------------------------------------------------------
# shortest_path / graph_summary
# ---------------------------------------------------------------------------

def _shortest_py(pairs, a, b, max_hops, undirected=True):
    adj = {}
    for s, o in set(pairs):
        adj.setdefault(s, set()).add(o)
        if undirected:
            adj.setdefault(o, set()).add(s)
    paths = {a: [a]}
    frontier = {a: [a]}
    hops = 0
    while b not in paths and hops < max_hops:
        nxt = {}
        for v, p in frontier.items():
            for n in adj.get(v, ()):
                if n not in paths:
                    cand = p + [n]
                    if n not in nxt or cand < nxt[n]:
                        nxt[n] = cand
        if not nxt:
            break
        hops += 1
        paths.update(nxt)
        frontier = nxt
    return (hops, paths[b]) if b in paths else None


def test_shortest_path_matches_reference(edges):
    for a, b in [("a", "d"), ("d", "a"), ("a", "f"), ("e", "f"), ("a", "a")]:
        rows = ga.shortest_path(edges, a, b, max_hops=4).collect()
        want = _shortest_py(_PAIRS, a, b, 4)
        if want is None:
            assert rows == [], (a, b)
        else:
            assert len(rows) == 1, (a, b)
            assert (rows[0]["hops"], rows[0]["path"]) == want, (a, b)


def test_shortest_path_directed_and_tie(spark):
    # two 2-hop routes a->x->z and a->y->z: lexicographically smaller
    # middle node wins on both engines
    pairs = [("a", "x"), ("a", "y"), ("x", "z"), ("y", "z"), ("z", "a")]
    rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
    edges = spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, chunk_id string, url string",
    )
    got = ga.shortest_path(edges, "a", "z", undirected=False).collect()
    assert (got[0]["hops"], got[0]["path"]) == (2, ["a", "x", "z"])
    # directed: z reaches x only through a
    got = ga.shortest_path(edges, "z", "x", undirected=False).collect()
    assert (got[0]["hops"], got[0]["path"]) == (2, ["z", "a", "x"])


def test_shortest_path_randomized_vs_python_oracle(spark):
    import random

    rng = random.Random(41)
    for trial in range(3):
        n = rng.randint(4, 12)
        m = rng.randint(3, 3 * n)
        pairs = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(m)
        ]
        rows = [(s, "R", o, f"c{i}", "u") for i, (s, o) in enumerate(pairs)]
        edges = spark.createDataFrame(
            rows,
            "subj_id string, pred string, obj_id string, chunk_id string, url string",
        )
        a, b = f"n{rng.randrange(n)}", f"n{rng.randrange(n)}"
        got = ga.shortest_path(edges, a, b, max_hops=5).collect()
        want = _shortest_py(pairs, a, b, 5)
        if want is None:
            assert got == [], (trial, a, b)
        else:
            assert (got[0]["hops"], got[0]["path"]) == want, (trial, a, b)


def test_graph_summary_matches_reference(edges):
    row = ga.graph_summary(edges).collect()[0]
    g = sorted(set((s, o) for s, o in _PAIRS))
    deg = {}
    for s, o in g:
        deg[s] = deg.get(s, 0) + 1
        deg[o] = deg.get(o, 0) + 1
    import statistics

    n = len(deg)
    ds = sorted(deg.values())
    assert row["n_nodes"] == n
    assert row["n_edges"] == len(g)
    assert row["density"] == round(len(g) / (n * (n - 1)), 9)
    assert row["max_degree"] == max(ds)
    assert row["avg_degree"] == round(sum(ds) / n, 6)
    assert row["p50_degree"] == statistics.quantiles(
        ds, n=100, method="inclusive"
    )[49]
