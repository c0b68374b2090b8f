#!/usr/bin/env python
"""spark-submit entry point — the reference CLI's two verbs
(cli/main.py:447-487) over the Spark engine:

    graphrag process <files>    ->  run_pipeline.py process --out ... --pages N
    graphrag query "<q>"        ->  run_pipeline.py query "<q>" --kg-dir ...
        --triplets / default        --mode triplets | hybrid
        --with-context              --mode context

Usage (the north-rule deployment shape):

    zip -r /tmp/hgqn_spark.zip hybrid_graphrag_with_qdrant_neo4j_spark
    spark-submit --master local[32] --py-files /tmp/hgqn_spark.zip \
        run_pipeline.py process --out /data/kg --pages 10000 [--input DIR]
    spark-submit ... run_pipeline.py query "Who founded Globex Systems?" \
        --kg-dir /data/kg --mode hybrid --top-k 10

Process mode reads pages from ``--input`` (parquet with the input_hint
schema) or generates the deterministic synthetic corpus with ``--pages``.
Resumable: rerunning with the same --out and input fingerprint skips
completed stages (plans.checkpoint manifests).  The bare legacy form
(``run_pipeline.py --out ...``) still works.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _render_query_results(mode: str, out: dict, top_k: int) -> None:
    """Terminal rendering mirroring the reference's print_query_results
    (cli/main.py:227-309): numbered chunks, MATCH/CONTEXT flags in
    context mode, a triplets section in triplets mode."""
    print("\n" + "=" * 80)
    print("QUERY RESULTS:")
    print("=" * 80)
    chunk_rows = out["chunks"].collect()
    if not chunk_rows:
        print("\nNo results found.")
    elif mode == "context":
        print("\nRetrieved chunks with context:")
        for i, r in enumerate(chunk_rows, 1):
            flag = "MATCH" if r["is_match"] else "CONTEXT"
            score = f" (score: {r['score']:.3f})" if r["is_match"] else ""
            print(f"\n{i}. {flag}: Chunk {r['chunk_id']}{score}:")
            print("-" * 40)
            print((r["text"] or "")[:500])
    else:
        print(f"\nTop {min(top_k, len(chunk_rows))} chunks:")
        for i, r in enumerate(chunk_rows, 1):
            print(f"\n{i}. Chunk {r['chunk_id']} (score: {r['score']:.3f}):")
            print("-" * 40)
            print((r["text"] or "")[:500])
    if out.get("triplets") is not None:
        print("\n" + "=" * 80)
        print("RELATED TRIPLETS:")
        print("=" * 80)
        trip_rows = out["triplets"].collect()
        if not trip_rows:
            print("\nNo triplets found.")
        for r in trip_rows:
            print(f"  {r['subj_id']} -[{r['pred']}]-> {r['obj_id']}  (chunk {r['chunk_id']})")
    print()


def _interactive_loop(rag, args, input_fn=None) -> None:
    """Interactive query session mirroring the reference's prompt loop
    (cli/main.py:361-445): exit/quit, help, ``set top_k|triplets|
    context|context_size``, ``show settings``, anything else = a query.
    ``input_fn`` is injectable so tests can drive the loop without a
    tty (resolved at call time so a patched builtins.input is seen)."""
    if input_fn is None:
        input_fn = input
    settings = {
        # reference defaults: config.py:131-134 + run_interactive_session
        "top_k": args.top_k,
        "include_triplets": True,
        "with_context": False,
        "context_size": args.context_size,
        "lexical": getattr(args, "lexical", "count"),
    }
    print("\nGraphRAG Interactive Query Session")
    print("Type 'exit' or 'quit' to end the session")
    print("Type 'help' for available commands")
    print("\nCurrent settings:")
    for key, value in settings.items():
        print(f"  {key}: {value}")

    while True:
        try:
            user_input = input_fn("\nGraphRAG> ")
        except (EOFError, KeyboardInterrupt):
            break
        user_input = (user_input or "").strip()
        if not user_input:
            continue
        low = user_input.lower()
        if low in ("exit", "quit"):
            break
        if low == "help":
            print("\nAvailable commands:")
            print("  <your question> - Query the GraphRAG system")
            print("  batch <file> - Answer every query in <file> (one per"
                  " line) as ONE job")
            print("  analytics [N] - Top-N entities by PageRank + degrees")
            print("  domains [N] - Top-N hosts by domain PageRank "
                  "(webgraph-staged KG)")
            print("  spam [N] - Top-N hosts by relative spam mass "
                  "(webgraph-staged KG)")
            print("  ppr <entity> - Entities near <entity> (personalized"
                  " PageRank)")
            print("  global <question> - Community-level context chunks"
                  " (GraphRAG global search)")
            print("  path <entity a> -> <entity b> - Shortest connection"
                  " in the entity graph")
            print("  set top_k <number> - Set number of top results")
            print("  set triplets <on/off> - Include knowledge graph triplets")
            print("  set context <on/off> - Include document context")
            print("  set context_size <number> - Set number of context chunks")
            print("  set lexical <count/bm25> - Term scorer for the graph leg")
            print("  show settings - Display current settings")
            print("  help - Show this help message")
            print("  exit/quit - Exit the session")
            continue
        if low == "analytics" or low.startswith("analytics "):
            from pyspark.sql import functions as F

            from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
                graph_analytics,
            )

            parts = user_input.split()
            try:
                top_n = int(parts[1]) if len(parts) > 1 else 10
            except ValueError:
                print("Usage: analytics [N]")
                continue
            edges = rag.table("edges")
            ranked = (
                graph_analytics.pagerank(edges)
                .join(graph_analytics.degree_centrality(edges), "entity_id")
                .orderBy(F.desc("pagerank"), F.asc("entity_id"))
                .limit(top_n)
                .collect()
            )
            print(f"\nTop {len(ranked)} entities by PageRank:")
            for r in ranked:
                print(
                    f"  {r['entity_id']}: rank={r['pagerank']:.4f} "
                    f"in={r['in_degree']} out={r['out_degree']}"
                )
            continue
        if low == "domains" or low.startswith("domains "):
            import os as _os

            from pyspark.sql import functions as F

            parts = user_input.split()
            try:
                top_n = int(parts[1]) if len(parts) > 1 else 10
            except ValueError:
                print("Usage: domains [N]")
                continue
            rank_dir = _os.path.join(args.kg_dir, "domain_rank", "data")
            if not _os.path.isdir(rank_dir):
                print("No domain_rank stage in this KG "
                      "(build with process --webgraph).")
                continue
            rows = (
                rag.spark.read.parquet(rank_dir)
                .orderBy(F.desc("pagerank"), F.asc("host"))
                .limit(top_n)
                .collect()
            )
            print(f"\nTop {len(rows)} hosts by domain PageRank:")
            for r in rows:
                print(f"  {r['host']}: {r['pagerank']:.4f}")
            continue
        if low == "spam" or low.startswith("spam "):
            import os as _os

            from pyspark.sql import functions as F

            from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
                webgraph as WG,
            )

            parts = user_input.split()
            try:
                top_n = int(parts[1]) if len(parts) > 1 else 10
            except ValueError:
                print("Usage: spam [N]")
                continue
            sm_dir = _os.path.join(args.kg_dir, "spam_mass", "data")
            hg_dir = _os.path.join(args.kg_dir, "host_graph", "data")
            if _os.path.isdir(sm_dir):
                # the pipeline materialized (and append-maintains) the
                # spam_mass stage — read it instead of recomputing
                sm = rag.spark.read.parquet(sm_dir)
            elif _os.path.isdir(hg_dir):
                hg = rag.spark.read.parquet(hg_dir)
                # seeds from the KG's own text snapshot (url/text/lang)
                sm = WG.spam_mass(hg, WG.trusted_hosts(rag.table("text")))
            else:
                print("No host_graph stage in this KG "
                      "(build with process --webgraph).")
                continue
            rows = (
                sm.orderBy(F.desc("spam_mass"), F.desc("pagerank"),
                           F.asc("host"))
                .limit(top_n)
                .collect()
            )
            print(f"\nTop {len(rows)} hosts by relative spam mass "
                  "(trust-seeded):")
            for r in rows:
                print(f"  {r['host']}: spam={r['spam_mass']:.4f} "
                      f"rank={r['pagerank']:.4f} trust={r['trust']:.4f}")
            continue
        if low.startswith("ppr "):
            from pyspark.sql import functions as F

            from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
                graph_analytics,
            )

            seed = user_input.split(" ", 1)[1].strip().lower()
            rows = (
                graph_analytics.personalized_pagerank(
                    rag.table("edges"), [seed]
                )
                .orderBy(F.desc("ppr"), F.asc("entity_id"))
                .limit(settings["top_k"])
                .collect()
            )
            if len(rows) <= 1:
                print(f"No graph neighborhood found for '{seed}'.")
            else:
                print(f"\nEntities near '{seed}' (personalized PageRank):")
                for r in rows:
                    print(f"  {r['entity_id']}: {r['ppr']:.6f}")
            continue
        if low.startswith("path ") and "->" in user_input:
            from hybrid_graphrag_with_qdrant_neo4j_spark.operators import (
                graph_analytics,
            )

            spec = user_input.split(" ", 1)[1]
            a, _, b = spec.partition("->")
            a, b = a.strip().lower(), b.strip().lower()
            rows = graph_analytics.shortest_path(
                rag.table("edges"), a, b, max_hops=6
            ).collect()
            if not rows:
                print(f"No path from '{a}' to '{b}' within 6 hops.")
            else:
                print(
                    f"\nPATH ({rows[0]['hops']} hops): "
                    + " -> ".join(rows[0]["path"])
                )
            continue
        if low.startswith("global "):
            question = user_input.split(" ", 1)[1].strip()
            rows = rag.global_chunks(
                question, top_k=settings["top_k"]
            ).collect()
            if not rows:
                print("No community context found.")
            else:
                print(f"\nCOMMUNITY CONTEXT ({len(rows)} chunks):")
                for r in rows:
                    print(
                        f"  [community {r['label']}] {r['chunk_id']}"
                        f"  ({r['n_entities']} member entities)"
                    )
                    print(f"    {(r['text'] or '')[:160]}")
            continue
        if low.startswith("batch "):
            # whole-file retrieval through query_many: the batch is ONE
            # Spark plan (29x over a per-prompt loop at 64 queries), the
            # same machinery the query-many verb uses — not a loop over
            # rag.query
            qpath = user_input.split(" ", 1)[1].strip()
            try:
                with open(qpath, "r", encoding="utf-8") as fh:
                    batch_qs = [
                        (f"q{i}", line.strip())
                        for i, line in enumerate(fh)
                        if line.strip()
                    ]
            except OSError as e:
                print(f"Error: cannot read {qpath}: {e}")
                continue
            if not batch_qs:
                print(f"No queries in {qpath}.")
                continue
            try:
                mode = "context" if settings["with_context"] else "hybrid"
                rows = rag.query_many(
                    batch_qs,
                    top_k=settings["top_k"],
                    vector_weight=args.vector_weight,
                    mode=mode,
                    context_size=settings["context_size"],
                    lexical=settings["lexical"],
                ).collect()
                by_query: dict = {}
                for r in rows:
                    by_query.setdefault(r["query_id"], []).append(r)
                print(f"\nBATCH RESULTS ({len(batch_qs)} queries, one job):")
                for qid, qtext in batch_qs:
                    hits = by_query.get(qid, [])
                    print(f"\n[{qid}] {qtext}  ({len(hits)} results)")
                    for r in hits:
                        flag = ""
                        if mode == "context":
                            flag = "MATCH " if r["is_match"] else "CTX   "
                        print(f"  {flag}{r['chunk_id']}  score={r['score']:.3f}")
            except Exception as e:  # loop survives bad batches too
                print(f"Error: {e}")
            continue
        if low.startswith("set "):
            parts = user_input.split(" ", 2)
            if len(parts) >= 3:
                setting, value = parts[1].lower(), parts[2].lower()
                if setting == "top_k" and value.isdigit():
                    settings["top_k"] = int(value)
                    print(f"Set top_k to {value}")
                elif setting == "triplets" and value in ("on", "off"):
                    settings["include_triplets"] = value == "on"
                    print(f"Set triplets to {value}")
                elif setting == "context" and value in ("on", "off"):
                    settings["with_context"] = value == "on"
                    print(f"Set context to {value}")
                elif setting == "context_size" and value.isdigit():
                    settings["context_size"] = int(value)
                    print(f"Set context_size to {value}")
                elif setting == "lexical" and value in ("count", "bm25"):
                    settings["lexical"] = value
                    print(f"Set lexical to {value}")
                else:
                    print(f"Unknown setting or invalid value: {setting} {value}")
            continue
        if low == "show settings":
            print("\nCurrent settings:")
            for key, value in settings.items():
                print(f"  {key}: {value}")
            continue
        try:
            mode = (
                "context"
                if settings["with_context"]
                else ("triplets" if settings["include_triplets"] else "hybrid")
            )
            out = rag.query(
                user_input,
                mode=mode,
                top_k=settings["top_k"],
                vector_weight=args.vector_weight,
                context_size=settings["context_size"],
                lexical=settings["lexical"],
            )
            if settings["with_context"] and settings["include_triplets"]:
                # the reference includes triplets alongside context
                # chunks when both are on; stitch in the triplet LEG
                # only (not a second full retrieval run)
                out["triplets"] = rag.triplets(user_input, settings["top_k"])
            _render_query_results(mode, out, settings["top_k"])
        except Exception as e:  # reference loop survives bad queries
            print(f"Error: {e}")
    print("\nExiting GraphRAG interactive session.")


def _interactive_main(args) -> None:
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG

    spark = get_spark(app_name="kg_interactive")
    rag = GraphRAG(spark, args.kg_dir, n_probe=args.n_probe)
    _interactive_loop(rag, args)
    spark.stop()


def _analytics_main(args) -> None:
    """Graph analytics over a built KG: PageRank + degree centrality on
    the canonical edge table, top-N printed as JSON.  (The reference
    keeps its graph in Neo4j where this is a Cypher aggregate; here it
    is a DataFrame job over the edges snapshot.)"""
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import graph_analytics
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="kg_analytics")
    edges = GraphRAG(spark, args.kg_dir).table("edges")
    pr = graph_analytics.pagerank(
        edges, damping=args.damping, iterations=args.iterations
    )
    deg = graph_analytics.degree_centrality(edges)
    top = (
        pr.join(deg, "entity_id")
        .orderBy(F.desc("pagerank"), F.asc("entity_id"))
        .limit(args.top)
        .collect()
    )
    out = {
        "n_entities": deg.count(),
        "graph": graph_analytics.graph_summary(edges).collect()[0].asDict(),
        "iterations": args.iterations,
        "damping": args.damping,
        "top": [
            {
                "entity_id": r["entity_id"],
                "pagerank": round(r["pagerank"], 6),
                "in_degree": r["in_degree"],
                "out_degree": r["out_degree"],
            }
            for r in top
        ],
    }
    if args.seed:
        ppr = (
            graph_analytics.personalized_pagerank(
                edges,
                [args.seed.lower()],
                damping=args.damping,
                iterations=args.iterations,
            )
            .orderBy(F.desc("ppr"), F.asc("entity_id"))
            .limit(args.top)
            .collect()
        )
        out["ppr_seed"] = args.seed.lower()
        out["ppr_top"] = [
            {"entity_id": r["entity_id"], "ppr": round(r["ppr"], 6)} for r in ppr
        ]
    if args.communities:
        rag = GraphRAG(spark, args.kg_dir)
        labels = graph_analytics.label_propagation(
            edges, iterations=args.lpa_iterations
        ).persist()
        top_chunks = graph_analytics.community_chunks(
            labels,
            rag.table("entities"),
            rag.table("mentions"),
            top_k=args.chunks_per_community,
        )
        sizes = (
            labels.groupBy("label").agg(F.count("*").alias("n_members"))
            .orderBy(F.desc("n_members"), F.asc("label"))
            .limit(args.top)
            .collect()
        )
        chunks_by_label: dict = {}
        for r in top_chunks.collect():
            chunks_by_label.setdefault(r["label"], []).append(
                {"chunk_id": r["chunk_id"], "n_entities": r["n_entities"]}
            )
        # structured half of the community report: the top supported
        # intra-community triples a summarizer would read
        triples_by_label: dict = {}
        for r in graph_analytics.community_triples(
            labels, edges, top_k=args.chunks_per_community
        ).collect():
            triples_by_label.setdefault(r["label"], []).append(
                {
                    "subj": r["subj_id"],
                    "pred": r["pred"],
                    "obj": r["obj_id"],
                    "support": r["support"],
                }
            )
        out["n_communities"] = labels.select("label").distinct().count()
        out["communities"] = [
            {
                "label": r["label"],
                "n_members": r["n_members"],
                "top_chunks": chunks_by_label.get(r["label"], []),
                "top_triples": triples_by_label.get(r["label"], []),
            }
            for r in sizes
        ]
        labels.unpersist()
    if args.cooccurrence:
        rag = GraphRAG(spark, args.kg_dir)
        em = rag.table("entities").select(
            F.col("name"), F.col("canonical_id")
        )
        pairs = (
            graph_analytics.entity_cooccurrence(
                rag.table("mentions").select(
                    "chunk_id", F.col("entity_name")
                ),
                em,
                min_count=args.min_cooccur,
            )
            .orderBy(F.desc("pmi"), F.asc("entity_a"), F.asc("entity_b"))
            .limit(args.cooccurrence)
            .collect()
        )
        out["cooccurrence_top"] = [
            {
                "entity_a": r["entity_a"],
                "entity_b": r["entity_b"],
                "n_ab": r["n_ab"],
                "pmi": r["pmi"],
            }
            for r in pairs
        ]
    if args.timeline:
        from hybrid_graphrag_with_qdrant_neo4j_spark.operators import temporal

        rag = GraphRAG(spark, args.kg_dir)
        tl = (
            temporal.entity_timeline(
                rag.table("mentions"), rag.table("chunks"), rag.table("text")
            )
            .filter(F.lower(F.col("entity_name")) == args.timeline.lower())
            .collect()
        )
        out["timeline"] = [
            {
                "entity_name": r["entity_name"],
                "first_seen": str(r["first_seen"]),
                "last_seen": str(r["last_seen"]),
                "n_mentions": r["n_mentions"],
                "n_pages": r["n_pages"],
            }
            for r in tl
        ]
    if args.asof:
        import datetime as _dt

        from hybrid_graphrag_with_qdrant_neo4j_spark.operators import temporal

        rag = GraphRAG(spark, args.kg_dir)
        ts = _dt.datetime.fromisoformat(args.asof)
        n_asof = temporal.edges_asof(edges, rag.table("text"), ts).count()
        n_all = edges.select("subj_id", "pred", "obj_id").distinct().count()
        out["asof"] = {
            "ts": args.asof,
            "n_edges_asof": n_asof,
            "n_edges_total": n_all,
        }
    print(json.dumps(out, indent=2))
    spark.stop()


def _webgraph_main(args) -> None:
    """Link-graph curation report over a RAW pages table (pre-KG): href
    extraction → host graph → domain PageRank → per-host quality
    profile.  The reference has no link-level view at all; at crawl
    scale this is the signal a prune/frontier decision reads (e.g.
    'drop every page of a host with mean_quality < 0.3', which prune
    --where can then express).  Writes the three derived tables as
    parquet when --out-dir is given and prints a top-N JSON summary."""
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import webgraph as WG
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="kg_webgraph")
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = corpus.pages_spark_df(spark, args.pages, seed=args.seed)
    links = WG.resolved_links(WG.outlinks(pages))
    hg = WG.host_graph(links).persist()
    rank = WG.domain_rank(hg, damping=args.damping,
                          iterations=args.iterations).persist()
    prof = WG.domain_profile(pages).persist()
    if args.out_dir:
        hg.write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "host_graph.parquet"))
        rank.write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "domain_rank.parquet"))
        prof.write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "domain_profile.parquet"))
    top = (
        rank.join(prof, rank["host"] == prof["host"], "left")
        .select(rank["host"], "pagerank", "n_pages", "mean_quality")
        .orderBy(F.desc("pagerank"), F.asc("host"))
        .limit(args.top)
        .collect()
    )
    low_q = (
        prof.filter(F.col("mean_quality") < args.quality_flag)
        .orderBy(F.asc("mean_quality"), F.asc("host"))
        .limit(args.top)
        .collect()
    )
    out = {
        "n_hosts": prof.count(),
        "n_host_edges": hg.count(),
        "n_links": links.count(),
        "top_hosts": [
            {
                "host": r["host"],
                "pagerank": round(r["pagerank"], 6),
                "n_pages": r["n_pages"],
                "mean_quality": r["mean_quality"],
            }
            for r in top
        ],
        "low_quality_hosts": [
            {
                "host": r["host"],
                "mean_quality": r["mean_quality"],
                "n_pages": r["n_pages"],
            }
            for r in low_q
        ],
    }
    if args.hits:
        hh = WG.host_hits(hg, iterations=args.iterations).persist()
        if args.out_dir:
            hh.write.mode("overwrite").parquet(
                os.path.join(args.out_dir, "host_hits.parquet"))
        out["hits"] = {
            "top_authorities": [
                {"host": r["host"], "authority": round(r["authority"], 6)}
                for r in hh.orderBy(
                    F.desc("authority"), F.asc("host")).limit(args.top).collect()
            ],
            "top_hubs": [
                {"host": r["host"], "hub": round(r["hub"], 6)}
                for r in hh.orderBy(
                    F.desc("hub"), F.asc("host")).limit(args.top).collect()
            ],
        }
        hh.unpersist()
    if args.reciprocity:
        rc = WG.reciprocity(hg).persist()
        if args.out_dir:
            rc.write.mode("overwrite").parquet(
                os.path.join(args.out_dir, "reciprocity.parquet"))
        out["reciprocity"] = {
            "n_hosts_with_outlinks": rc.count(),
            "top_reciprocal_hosts": [
                {"host": r["host"], "reciprocity": round(r["reciprocity"], 6),
                 "n_out_hosts": r["n_out_hosts"]}
                for r in rc.filter(F.col("n_out_hosts") >= 2)
                .orderBy(F.desc("reciprocity"), F.desc("n_out_hosts"),
                         F.asc("host"))
                .limit(args.top).collect()
            ],
        }
        rc.unpersist()
    if args.spam:
        # link-spam curation: TrustRank from a trusted seed set, then
        # relative spam mass (rank share NOT explained by trust flow)
        if args.seed_hosts:
            seeds = [h.strip() for h in args.seed_hosts.split(",") if h.strip()]
            if not seeds:
                # ADVICE r5: an all-whitespace seed list silently made
                # every host report spam_mass 1.0 (n_seeds=0)
                raise SystemExit(
                    "--seed-hosts parsed to an empty list; pass real "
                    "hostnames or omit the flag to derive seeds from "
                    "domain_profile"
                )
        else:
            seeds = WG.trusted_hosts(
                pages, min_pages=args.seed_min_pages,
                min_quality=args.seed_min_quality,
            )
        sm = WG.spam_mass(hg, seeds, damping=args.damping,
                          iterations=args.iterations).persist()
        if args.out_dir:
            sm.write.mode("overwrite").parquet(
                os.path.join(args.out_dir, "spam_mass.parquet"))
        flagged = (
            sm.filter(F.col("spam_mass") >= args.spam_flag)
            .orderBy(F.desc("spam_mass"), F.desc("pagerank"), F.asc("host"))
            .limit(args.top)
            .collect()
        )
        n_seeds = (seeds.count() if not isinstance(seeds, list)
                   else len(seeds))
        out["spam"] = {
            "n_seeds": n_seeds,
            "n_flagged": sm.filter(
                F.col("spam_mass") >= args.spam_flag).count(),
            "spam_flag": args.spam_flag,
            "top_spam_hosts": [
                {
                    "host": r["host"],
                    "spam_mass": round(r["spam_mass"], 6),
                    "pagerank": round(r["pagerank"], 6),
                    "trust": round(r["trust"], 6),
                }
                for r in flagged
            ],
        }
        sm.unpersist()
    if args.out_dir:
        out["out_dir"] = args.out_dir
    print(json.dumps(out, indent=2))
    spark.stop()


def _info_main(args) -> None:
    """Print every stage's checkpoint manifest — the per-partition
    lineage + metrics the north rule requires, made user-visible.  Pure
    filesystem reads; no Spark session needed."""
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.checkpoint import load_manifest

    stages = sorted(
        d for d in os.listdir(args.kg_dir)
        if os.path.isdir(os.path.join(args.kg_dir, d))
    )
    out = {}
    for stage in stages:
        man = load_manifest(args.kg_dir, stage)
        if man is None:
            continue
        entry = {
            k: man[k]
            for k in ("fingerprint", "n_rows", "n_partitions", "schema",
                      "family", "params", "iceberg_table", "snapshot_id")
            if k in man
        }
        data = os.path.join(args.kg_dir, stage,
                            "data" if stage != "ann_index" else "vectors")
        if os.path.isdir(data):
            n_files = n_bytes = 0
            for root, _dirs, files in os.walk(data):
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(root, f))
            entry["data_files"] = n_files
            entry["data_bytes"] = n_bytes
        out[stage] = entry
    ledger = os.path.join(args.kg_dir, "_applied_batches.jsonl")
    if os.path.exists(ledger):
        with open(ledger, "r", encoding="utf-8") as fh:
            batches = [json.loads(line) for line in fh if line.strip()]
        applied = [b for b in batches if b.get("status") != "started"]
        applied_ids = {b.get("batch_id") for b in applied}
        # a 'started' marker with no completion = a crashed mid-apply
        # batch; surfaced here so the operator sees it without grepping
        unfinished = sorted(
            {b.get("batch_id") for b in batches if b.get("status") == "started"}
            - applied_ids
        )
        out["_applied_batches"] = {
            "n_batches": len(applied),
            "unfinished_batch_ids": unfinished,
            "last": applied[-5:],
        }
    print(json.dumps(out, indent=2))


def _append_main(args) -> None:
    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import append_batch

    spark = get_spark(app_name="kg_append")
    partitions = args.partitions or spark.sparkContext.defaultParallelism
    if args.input:
        new_pages = spark.read.parquet(args.input)
        batch_id = args.batch_id or f"input:{os.path.basename(args.input.rstrip('/'))}"
    else:
        new_pages = corpus.pages_spark_df(
            spark, args.pages, seed=args.seed, partitions=partitions,
            start=args.start,
        )
        batch_id = args.batch_id or f"corpus:{args.start}+{args.pages}:{args.seed}"
    t0 = time.perf_counter()
    stats = append_batch(
        spark,
        args.kg_dir,
        new_pages,
        batch_id=batch_id,
        max_tokens=args.max_tokens,
        num_partitions=partitions,
        on_changed=args.on_changed,
    )
    stats["elapsed_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(stats, indent=2))
    spark.stop()


def _query_main(args) -> None:
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG

    spark = get_spark(app_name="kg_query")
    rag = GraphRAG(spark, args.kg_dir, n_probe=args.n_probe)
    out = rag.query(
        args.query,
        mode=args.mode,
        top_k=args.top_k,
        vector_weight=args.vector_weight,
        context_size=args.context_size,
        lexical=args.lexical,
    )
    _render_query_results(args.mode, out, args.top_k)
    spark.stop()


def _query_many_main(args) -> None:
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.graphrag import GraphRAG

    with open(args.queries_file, "r", encoding="utf-8") as fh:
        queries = [
            (f"q{i}", line.strip())
            for i, line in enumerate(fh)
            if line.strip()
        ]
    spark = get_spark(app_name="kg_query_many")
    rag = GraphRAG(spark, args.kg_dir, n_probe=args.n_probe)
    out = rag.query_many(
        queries,
        top_k=args.top_k,
        vector_weight=args.vector_weight,
        mode=args.mode,
        context_size=args.context_size,
        lexical=args.lexical,
    ).collect()
    by_query: dict = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    print("\n" + "=" * 80)
    print(f"BATCH QUERY RESULTS ({len(queries)} queries, one job):")
    print("=" * 80)
    for qid, qtext in queries:
        rows = by_query.get(qid, [])
        print(f"\n[{qid}] {qtext}  ({len(rows)} results)")
        for r in rows:
            flag = ""
            if args.mode == "context":
                flag = "MATCH " if r["is_match"] else "CTX   "
            print(f"  {flag}{r['chunk_id']}  score={r['score']:.3f}")
    print()
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")

    proc = sub.add_parser("process", help="build the KG (reference: graphrag process)")
    proc.add_argument("--out", required=True, help="output/checkpoint directory")
    proc.add_argument("--input", help="parquet dir of pages (input_hint schema)")
    proc.add_argument("--pages", type=int, default=1000, help="synthetic corpus size")
    proc.add_argument("--max-tokens", type=int, default=200)
    proc.add_argument("--partitions", type=int, default=None)
    proc.add_argument("--seed", type=int, default=42)
    proc.add_argument(
        "--ann-index",
        choices=["ivf", "lsh"],
        default=None,
        help="materialize a write-time ANN index over the chunk embeddings; "
        "queries against this KG then read a partition-pruned scan "
        "(reference: Qdrant index built at upsert)",
    )
    proc.add_argument(
        "--webgraph",
        action="store_true",
        help="also materialize the web link graph as resumable stages "
        "(host_graph + domain_rank; append-maintained, additive counts)",
    )
    proc.add_argument("--ann-k", type=int, default=64, help="IVF centroid count")
    proc.add_argument("--ann-bits", type=int, default=8, help="LSH code bits")
    proc.add_argument("--ann-tables", type=int, default=4, help="LSH hash tables")

    qm = sub.add_parser(
        "query-many",
        help="answer a whole query batch in one job (one query per line)",
    )
    qm.add_argument("--kg-dir", required=True)
    qm.add_argument("--queries-file", required=True,
                    help="text file, one query per line; query_id = line number")
    qm.add_argument("--mode", choices=["hybrid", "context"], default="hybrid")
    qm.add_argument("--top-k", type=int, default=10)
    qm.add_argument("--vector-weight", type=float, default=0.5)
    qm.add_argument("--context-size", type=int, default=2)
    qm.add_argument("--n-probe", type=int, default=8,
                    help="IVF buckets probed per query when the KG has an index")
    qm.add_argument("--lexical", choices=["count", "bm25"], default="count",
                    help="term scorer for the graph leg (bm25 = tf/idf + "
                    "length normalization over the same n-gram vocabulary)")

    app = sub.add_parser(
        "append",
        help="append a page batch to a built KG with incremental entity "
        "linking (no full rebuild)",
    )
    app.add_argument("--kg-dir", required=True)
    app.add_argument("--input", help="parquet dir of new pages (input_hint schema)")
    app.add_argument("--pages", type=int, default=1000,
                     help="synthetic batch size (generated AFTER the ids of "
                     "--start, for disjoint urls)")
    app.add_argument("--start", type=int, default=0,
                     help="synthetic corpus offset of the batch")
    app.add_argument("--batch-id", default=None)
    app.add_argument("--on-changed", choices=["keep_first", "replace"],
                     default="keep_first",
                     help="re-fetched urls whose content changed: keep the "
                     "stored snapshot (and count them), or delete their rows "
                     "from every table and re-ingest the new content with an "
                     "exact entity-graph repair")
    app.add_argument("--max-tokens", type=int, default=200)
    app.add_argument("--partitions", type=int, default=None)
    app.add_argument("--seed", type=int, default=42)

    info = sub.add_parser(
        "info",
        help="show per-stage lineage + metrics manifests of a built KG",
    )
    info.add_argument("--kg-dir", required=True)

    an = sub.add_parser(
        "analytics",
        help="PageRank + degree centrality over the KG's canonical edges",
    )
    an.add_argument("--kg-dir", required=True)
    an.add_argument("--top", type=int, default=10)
    an.add_argument("--iterations", type=int, default=10)
    an.add_argument("--damping", type=float, default=0.85)
    an.add_argument("--seed", default=None,
                    help="entity name: add personalized-PageRank top "
                    "entities around this seed (random walk with restart)")
    an.add_argument("--communities", action="store_true",
                    help="add label-propagation communities with their "
                    "top chunks (global-search context)")
    an.add_argument("--lpa-iterations", type=int, default=5)
    an.add_argument("--chunks-per-community", type=int, default=3)
    an.add_argument("--cooccurrence", type=int, default=0, metavar="N",
                    help="add the top-N entity pairs by PMI over chunk "
                    "co-mentions (latent relations the triples missed)")
    an.add_argument("--min-cooccur", type=int, default=2,
                    help="minimum co-mention count for --cooccurrence")
    an.add_argument("--timeline", default=None, metavar="ENTITY",
                    help="crawl-time window + support for this entity "
                    "(first/last warc_ts sighting)")
    an.add_argument("--asof", default=None, metavar="TS",
                    help="ISO timestamp: report the provenance-filtered "
                    "edge count as of this crawl time")

    wg = sub.add_parser(
        "webgraph",
        help="link-graph curation report over a raw pages table: host "
        "graph, domain PageRank, per-host quality profile",
    )
    wg.add_argument("--input", help="parquet dir of pages (input_hint schema)")
    wg.add_argument("--pages", type=int, default=1000,
                    help="synthetic corpus size when --input is absent")
    wg.add_argument("--seed", type=int, default=42)
    wg.add_argument("--out-dir", default=None,
                    help="write host_graph/domain_rank/domain_profile parquet")
    wg.add_argument("--top", type=int, default=10)
    wg.add_argument("--iterations", type=int, default=10)
    wg.add_argument("--damping", type=float, default=0.85)
    wg.add_argument("--quality-flag", type=float, default=0.30,
                    help="report hosts with mean_quality below this")
    wg.add_argument("--hits", action="store_true",
                    help="add HITS hubs/authorities per host")
    wg.add_argument("--reciprocity", action="store_true",
                    help="add per-host link reciprocity (link-exchange "
                    "signal)")
    wg.add_argument("--spam", action="store_true",
                    help="add TrustRank + relative spam-mass per host "
                    "(seeded walk from trusted hosts)")
    wg.add_argument("--seed-hosts", default=None,
                    help="comma-separated trusted seed hosts; default: "
                    "quality-selected via --seed-min-quality/--seed-min-pages")
    wg.add_argument("--seed-min-quality", type=float, default=0.5)
    wg.add_argument("--seed-min-pages", type=int, default=2)
    wg.add_argument("--spam-flag", type=float, default=0.95,
                    help="report hosts with spam_mass >= this")

    cp = sub.add_parser(
        "compact",
        help="small-file compaction of the KG snapshots after appends",
    )
    cp.add_argument("--kg-dir", required=True)
    cp.add_argument("--partitions", type=int, default=None)

    pr = sub.add_parser(
        "prune",
        help="curation over a built KG: delete docs matching a drop "
        "selector from every table (+ ANN vectors) and repair the "
        "entity graph exactly (orphans vanish, components split)",
    )
    pr.add_argument("--kg-dir", required=True)
    pr.add_argument("--where", default=None,
                    help="SQL drop predicate over doc_id, url, lang, text, "
                    "pred_lang, quality, n_tokens")
    pr.add_argument("--min-quality", type=float, default=None,
                    help="drop docs with quality < this")
    pr.add_argument("--keep-lang", default=None,
                    help="drop docs whose predicted language differs")
    pr.add_argument("--min-host-quality", type=float, default=None,
                    help="drop EVERY doc of a host whose mean quality "
                    "is below this (content farms are host-shaped)")
    pr.add_argument("--batch-id", default=None,
                    help="ledger id (default: hash of the selector — "
                    "re-running the same prune is a no-op)")
    pr.add_argument("--dry-run", action="store_true",
                    help="report how many docs WOULD be dropped, by lang")

    ev = sub.add_parser(
        "evaluate",
        help="ANN serving-quality report: recall@k of the written index "
        "vs the exact scan on a deterministic self-query sample",
    )
    ev.add_argument("--kg-dir", required=True)
    ev.add_argument("--sample", type=int, default=64)
    ev.add_argument("--top-k", type=int, default=10)
    ev.add_argument("--n-probe", type=int, default=3)
    ev.add_argument("--seed", type=int, default=7)

    ex = sub.add_parser(
        "export",
        help="bulk-export the KG as a neo4j-admin database import file "
        "set (the scale path back into the reference's store: "
        "distributed CSV parts + header files, no Bolt round trips)",
    )
    ex.add_argument("--kg-dir", required=True)
    ex.add_argument("--out-dir", required=True)
    ex.add_argument("--format", choices=["neo4j-bulk"], default="neo4j-bulk")

    rx = sub.add_parser(
        "reindex",
        help="re-train the ANN quantizer over the current chunk embeddings "
        "and rebuild the bucketed index (recall refresh under "
        "distribution drift; reference: Qdrant's background optimizer)",
    )
    rx.add_argument("--kg-dir", required=True)
    rx.add_argument("--family", choices=["ivf", "lsh"], default=None,
                    help="switch index family (default: keep the manifest's)")
    rx.add_argument("--ann-k", type=int, default=None, help="new IVF centroid count")
    rx.add_argument("--ann-bits", type=int, default=None, help="new LSH code bits")
    rx.add_argument("--ann-tables", type=int, default=None, help="new LSH tables")
    rx.add_argument("--lloyd-iters", type=int, default=2)

    ip = sub.add_parser(
        "interactive",
        help="interactive query session (reference: graphrag interactive)",
    )
    ip.add_argument("--kg-dir", required=True)
    ip.add_argument("--top-k", type=int, default=10)
    ip.add_argument("--vector-weight", type=float, default=0.5)
    ip.add_argument("--context-size", type=int, default=2)
    ip.add_argument("--n-probe", type=int, default=8)
    ip.add_argument("--lexical", choices=["count", "bm25"], default="count",
                    help="term scorer for the graph leg (bm25 = tf/idf + "
                    "length normalization over the same n-gram vocabulary)")

    qp = sub.add_parser("query", help="query a built KG (reference: graphrag query)")
    qp.add_argument("query")
    qp.add_argument("--kg-dir", required=True, help="directory written by process")
    qp.add_argument(
        "--mode",
        choices=["hybrid", "context", "triplets", "global"],
        default="hybrid",
        help="hybrid (default) | context (--with-context) | triplets "
        "(--triplets) | global (community-level context)",
    )
    # reference defaults: config.py:131-134
    qp.add_argument("--top-k", type=int, default=10)
    qp.add_argument("--vector-weight", type=float, default=0.5)
    qp.add_argument("--context-size", type=int, default=2)
    qp.add_argument("--n-probe", type=int, default=8,
                    help="IVF buckets probed per query when the KG has an index")
    qp.add_argument("--lexical", choices=["count", "bm25"], default="count",
                    help="term scorer for the graph leg (bm25 = tf/idf + "
                    "length normalization over the same n-gram vocabulary)")

    argv = sys.argv[1:]
    if argv and argv[0].startswith("--"):  # legacy flat form == process
        argv = ["process"] + argv
    args = ap.parse_args(argv)
    if args.cmd is None:
        ap.print_help()
        sys.exit(2)
    if args.cmd == "query":
        _query_main(args)
        return
    if args.cmd == "query-many":
        _query_many_main(args)
        return
    if args.cmd == "interactive":
        _interactive_main(args)
        return
    if args.cmd == "append":
        _append_main(args)
        return
    if args.cmd == "info":
        _info_main(args)
        return
    if args.cmd == "analytics":
        _analytics_main(args)
        return
    if args.cmd == "webgraph":
        _webgraph_main(args)
        return
    if args.cmd == "compact":
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import (
            compact_tables,
        )

        spark = get_spark(app_name="kg_compact")
        print(json.dumps(
            compact_tables(spark, args.kg_dir, target_partitions=args.partitions),
            indent=2,
        ))
        spark.stop()
        return
    if args.cmd == "evaluate":
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        from hybrid_graphrag_with_qdrant_neo4j_spark.plans.evaluate import evaluate_ann

        spark = get_spark(app_name="kg_evaluate")
        print(json.dumps(
            evaluate_ann(
                spark,
                args.kg_dir,
                sample=args.sample,
                top_k=args.top_k,
                n_probe=args.n_probe,
                seed=args.seed,
            ),
            indent=2,
        ))
        spark.stop()
        return
    if args.cmd == "prune":
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import prune_kg

        spark = get_spark(app_name="kg_prune")
        print(json.dumps(
            prune_kg(
                spark,
                args.kg_dir,
                where=args.where,
                min_quality=args.min_quality,
                keep_lang=args.keep_lang,
                min_host_quality=args.min_host_quality,
                batch_id=args.batch_id,
                dry_run=args.dry_run,
            ),
            indent=2,
        ))
        spark.stop()
        return
    if args.cmd == "export":
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        from hybrid_graphrag_with_qdrant_neo4j_spark.plans.export import (
            export_neo4j_bulk,
        )

        spark = get_spark(app_name="kg_export")
        print(json.dumps(
            export_neo4j_bulk(spark, args.kg_dir, args.out_dir), indent=2
        ))
        spark.stop()
        return
    if args.cmd == "reindex":
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        from hybrid_graphrag_with_qdrant_neo4j_spark.plans.incremental import (
            reindex_ann,
        )

        spark = get_spark(app_name="kg_reindex")
        print(json.dumps(
            reindex_ann(
                spark,
                args.kg_dir,
                family=args.family,
                k=args.ann_k,
                bits=args.ann_bits,
                n_tables=args.ann_tables,
                lloyd_iters=args.lloyd_iters,
            ),
            indent=2,
        ))
        spark.stop()
        return

    from hybrid_graphrag_with_qdrant_neo4j_spark import corpus
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
    from hybrid_graphrag_with_qdrant_neo4j_spark.plans.pipeline import build_kg

    spark = get_spark(app_name="kg_build")
    cpus = spark.sparkContext.defaultParallelism
    partitions = args.partitions or cpus

    if args.input:
        pages = spark.read.parquet(args.input)
        # fingerprint from input CONTENT metadata, not the path: an
        # in-place rewrite of the parquet must invalidate the resume
        # snapshots (ADVICE r1)
        import hashlib

        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(args.input)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        fingerprint = f"input:{args.input}:{h.hexdigest()[:16]}"
    else:
        pages = corpus.pages_spark_df(
            spark, args.pages, seed=args.seed, partitions=partitions
        )
        fingerprint = f"corpus:{args.pages}:{args.seed}"

    t0 = time.perf_counter()
    result = build_kg(
        spark,
        pages,
        args.out,
        input_fingerprint=fingerprint,
        max_tokens=args.max_tokens,
        num_partitions=partitions,
        ann_index=args.ann_index,
        ann_k=args.ann_k,
        ann_bits=args.ann_bits,
        ann_tables=args.ann_tables,
        webgraph=args.webgraph,
    )
    elapsed = time.perf_counter() - t0
    summary = {
        "elapsed_sec": round(elapsed, 2),
        "resumed_stages": sorted(result.resumed_stages),
        "tables": {k: v.count() for k, v in result.tables.items()},
        "partitions": partitions,
    }
    print(json.dumps(summary, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
