"""PySpark-native knowledge-graph construction + hybrid retrieval engine.

A from-scratch rebuild of the capability surface of
``GreyMaker-ops/hybrid-graphrag-with-qdrant-neo4j`` (a single-process
Neo4j+Qdrant GraphRAG CLI) as idiomatic PySpark DataFrame stages over
parquet/Iceberg tables.  See SURVEY.md for the operator-by-operator
mapping (reference file:line citations live in each module docstring).

Layout:
    textproc     -- pure-Python deterministic tokenizer / chunker /
                    n-grams / triple parser shared by the single-process
                    oracle and the Spark pandas UDFs (parity by construction)
    stopwords    -- frozen english stopword fixture
    corpus       -- deterministic synthetic Common-Crawl-style ``pages``
                    generator (seed=42, no external data)
    session      -- SparkSession factory tuned for this engine
    sources/     -- pages source (html -> text extraction), parquet IO
    functions/   -- embedding UDFs, text-quality / language-id functions
    operators/   -- chunker, ngrams, triples, linking, connected
                    components, retrieval, dedup, similarity, trends
    plans/       -- end-to-end pipeline + checkpoint/resume manifests
    streaming/   -- incremental ingest (foreachBatch micro-batching)
"""

__version__ = "0.1.0"
