"""Sentence-aware greedy chunker + chunk chain (SURVEY.md F1-F4, §2.8).

Reference: ingest.py:65-101 (chunk_text), ingest.py:144-177 (Chunk nodes
+ NEXT/PREV edges — here derived with window lead/lag instead of
materialized edges).

The chunker is inherently sequential *within* a document and
embarrassingly parallel *across* documents, so the pandas UDF maps one
document text -> array<struct<chunk_index,text>> and we ``posexplode``-
style flatten afterwards.  Never split one document across partitions
before chunking.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .. import textproc as tp

_CHUNKS_TYPE = T.ArrayType(T.StringType())


def _chunk_udf(max_tokens: int):
    @F.pandas_udf(_CHUNKS_TYPE)
    def chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tp.chunk_text(t or "", max_tokens))

    return chunk


def chunk_documents(
    pages: DataFrame,
    max_tokens: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """pages(url, doc_id, text, ...) -> chunks(url, doc_id, chunk_id,
    chunk_index, text).

    chunk_id = ``{doc_id}_chunk{i}`` (ingest.py:145 synthesis, F4).
    Empty texts produce zero chunks (ingest.py:75-77).
    """
    chunked = pages.withColumn("_chunks", _chunk_udf(max_tokens)(F.col(text_col)))
    exploded = chunked.select(
        "url",
        "doc_id",
        "lang",
        F.posexplode("_chunks").alias("chunk_index", "chunk_text"),
    )
    return exploded.select(
        "url",
        "doc_id",
        "lang",
        F.concat(F.col("doc_id"), F.lit("_chunk"), F.col("chunk_index")).alias(
            "chunk_id"
        ),
        "chunk_index",
        F.col("chunk_text").alias("text"),
    )


def with_chunk_chain(chunks: DataFrame) -> DataFrame:
    """Derive NEXT/PREV (ingest.py:162-177) as columns via lead/lag over
    (doc_id, chunk_index) — no edge materialization needed; the window
    shuffle is the same hash partitioning the chunker already produced."""
    w = Window.partitionBy("doc_id").orderBy("chunk_index")
    return chunks.withColumn("next_chunk_id", F.lead("chunk_id").over(w)).withColumn(
        "prev_chunk_id", F.lag("chunk_id").over(w)
    )
