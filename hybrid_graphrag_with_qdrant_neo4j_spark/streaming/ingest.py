"""Incremental ingest as Structured Streaming (stretch goal; SURVEY.md
§1.3: the reference's per-file CLI loop, cli/main.py:115-156, is morally
a micro-batch stream).

A file-source stream of page parquet drops feeds ``foreachBatch``; each
batch runs the same deterministic stages as the batch pipeline (the
stage functions are shared — streaming is just the scheduler here) and
appends to the chunk/term/triple tables.  Entity canonicalization stays
a periodic batch job (connected components is iterative, not
incremental); that split — streaming extraction + batch consolidation —
is the standard lambda shape for KG builds.

Also provides a session_window aggregation twin of
operators.trends.sessionize for true streaming sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import chunker, ngrams, triples as triples_op
from ..sources import pages as pages_src


def start_incremental_ingest(
    spark: SparkSession,
    pages_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    max_tokens: int = 200,
    pages_schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    ivf_index_dir: str | None = None,
    ivf_k: int = 64,
):
    """readStream over arriving page files -> per-batch extract/chunk/
    term/triple appends.  Exactly-once per batch via the streaming
    checkpoint (batch id tracked by the engine).

    With ``ivf_index_dir``, each micro-batch also embeds its chunks and
    maintains the write-time ANN index (operators.ann_index): the first
    batch trains the quantizer and writes the bucketed layout, later
    batches append against the FROZEN centroids — queries stay
    partition-pruned with no rebuild (streaming maintenance + periodic
    batch re-train, the same lambda split as entity canonicalization).
    """
    import os as _os

    from ..functions import embedding as E
    from ..operators import ann_index

    stream = (
        spark.readStream.schema(pages_schema).format("parquet").load(pages_glob)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: chunks feed up to four sinks per batch (chunk table,
        # term edges, triples, index) — the extract+chunk UDF chain runs once
        chunks = chunker.chunk_documents(
            pages_src.with_doc_id(pages_src.with_extracted_text(batch_df)),
            max_tokens=max_tokens,
        ).persist()
        try:
            chunks.write.mode("append").parquet(f"{out_dir}/chunks")
            en = chunks.filter(F.col("lang") == "en")
            ngrams.term_chunk_edges(en).write.mode("append").parquet(
                f"{out_dir}/term_chunk_edges"
            )
            triples_op.triples_raw(en).write.mode("append").parquet(
                f"{out_dir}/triples_raw"
            )
            # empty-batch guard (ADVICE r3): a batch yielding zero chunks
            # before the index exists would send an empty table into
            # ivf_train_centroids -> ValueError -> stream termination;
            # defer training to the first non-empty batch (and skip the
            # pointless empty append on later ones)
            if ivf_index_dir and not chunks.isEmpty():
                emb = chunks.select(
                    F.col("chunk_id").alias("vec_id"),
                    E.embed(F.col("text"), prefix="passage: ").alias("embedding"),
                )
                if _os.path.isdir(_os.path.join(ivf_index_dir, "centroids")):
                    ann_index.append_ivf_index(emb, ivf_index_dir, id_col="vec_id")
                else:
                    ann_index.write_ivf_index(emb, ivf_index_dir, k=ivf_k)
        finally:
            chunks.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_kg_ingest(
    spark: SparkSession,
    pages_glob: str,
    kg_dir: str,
    checkpoint_dir: str,
    max_tokens: int = 200,
    num_partitions: int = 8,
    pages_schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    on_changed: str = "keep_first",
):
    """Streaming maintenance of the WHOLE KG — graph side included
    (extends :func:`start_incremental_ingest`, which maintains only the
    chunk/term/triple tables + ANN index): every micro-batch runs
    ``plans.incremental.append_batch``, so arriving pages flow through
    extraction, incremental entity linking (CC on the contracted
    new-names + touched-canonicals graph only), the touched-component
    edges remap, and — when the KG carries a written ANN index — the
    frozen-quantizer index append.  The first batch bootstraps an empty
    KG through the same code path.

    Exactly-once per batch comes from the streaming checkpoint (the
    engine tracks batch ids; a replayed batch re-runs append_batch,
    which is NOT idempotent for the append-only tables — production
    would pair this with Iceberg snapshot commits per batch id, the
    same caveat as the plain ingest stream's parquet appends)."""
    from ..plans.incremental import append_batch

    stream = (
        spark.readStream.schema(pages_schema).format("parquet").load(pages_glob)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(
            spark,
            kg_dir,
            batch_df,
            batch_id=f"stream:{batch_id}",
            max_tokens=max_tokens,
            num_partitions=num_partitions,
            on_changed=on_changed,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_first_seen(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: streaming
    exact dedup — emit each document the FIRST time its content hash is
    seen across the whole stream, suppress every later duplicate.

    This is the streaming twin of operators.dedup.exact_dedup and the
    shape a continuous training-data ingest needs (a crawl re-fetches
    the same page forever; the corpus must receive it once).  State is
    keyed by md5(text) — one boolean per distinct content, partitioned
    by the engine's state store, so state size tracks DISTINCT content,
    not stream volume.  At 10^12 docs the state store is RocksDB-backed
    and sharded across executors; the operator shape is unchanged.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{id_col} string, content_hash string"

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            # content already emitted in an earlier batch: suppress
            for _ in pdf_iter:
                pass
            return
        first_id = None
        for pdf in pdf_iter:
            if len(pdf):
                # deterministic winner: lexicographic-min string id over
                # the WHOLE micro-batch — accumulated across every Arrow
                # chunk of the group, so the result is independent of how
                # the engine chunks the batch (ADVICE r2: first-chunk-only
                # was chunk-order-dependent)
                chunk_min = str(pdf[id_col].astype(str).min())
                first_id = chunk_min if first_id is None else min(first_id, chunk_min)
        if first_id is None:
            return
        state.update((1,))
        import pandas as pd  # noqa: PLC0415 (worker-side import)

        yield pd.DataFrame({id_col: [first_id], "content_hash": [key[0]]})

    hashed = docs_stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.select(F.col(id_col).cast("string").alias(id_col), "content_hash").groupBy(
        "content_hash"
    ).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessions(
    events_stream: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """session_window aggregation with a watermark for late events —
    the streaming twin of operators.trends.sessionize."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{gap_minutes} minutes").alias("session"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
