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
):
    """readStream over arriving page files -> per-batch extract/chunk/
    term/triple appends.  Exactly-once per batch via the streaming
    checkpoint (batch id tracked by the engine)."""
    stream = (
        spark.readStream.schema(pages_schema).format("parquet").load(pages_glob)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        p = pages_src.with_doc_id(pages_src.with_extracted_text(batch_df))
        chunks = chunker.chunk_documents(p, max_tokens=max_tokens)
        chunks.write.mode("append").parquet(f"{out_dir}/chunks")
        en = chunks.filter(F.col("lang") == "en")
        ngrams.term_chunk_edges(en).write.mode("append").parquet(
            f"{out_dir}/term_chunk_edges"
        )
        triples_op.triples_raw(en).write.mode("append").parquet(
            f"{out_dir}/triples_raw"
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
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
