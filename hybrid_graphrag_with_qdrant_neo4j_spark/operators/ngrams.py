"""Term graph: n-gram extraction -> term_chunk_edges (SURVEY.md F5/F6/M5).

Reference: nlp_graph.py:35-58 (extract_ngrams: lowercase + isalnum filter,
stopwords removed from unigrams only), nlp_graph.py:60-104 (MERGE writes
=> dropDuplicates), nlp_graph.py:134-215 (the reference's own Spark NLP
sketch, which collected to the driver — our version stays distributed
end-to-end and writes edges as a DataFrame).

Tokenization stays in a pandas UDF for parity (``str.isalnum`` has
Unicode semantics that JVM regexes don't reproduce exactly); everything
downstream (explode, dedup, joins) is JVM-side.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import textproc as tp

_TERMS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("type", T.StringType()),
        ]
    )
)


@F.pandas_udf(_TERMS_TYPE)
def _ngram_udf(texts: pd.Series) -> pd.Series:
    def one(text: str) -> List[Tuple[str, str]]:
        uni, bi, tri = tp.extract_ngrams(text or "")
        # MERGE dedup (nlp_graph.py:93-94) happens HERE: the edge key is
        # (chunk_id, term, type), so duplicates can only occur within a
        # single chunk — deduping inside the UDF makes the whole stage
        # shuffle-free (dict preserves first-seen order deterministically)
        return list(
            dict.fromkeys(
                [(t, "unigram") for t in uni]
                + [(t, "bigram") for t in bi]
                + [(t, "trigram") for t in tri]
            )
        )

    return texts.map(one)


def term_chunk_edges(chunks: DataFrame) -> DataFrame:
    """chunks -> term_chunk_edges(chunk_id, term, type), MERGE-deduped.

    Cypher MERGE's at-most-once semantics (nlp_graph.py:93-94) need no
    shuffle at all: the dedup key contains chunk_id, so uniqueness is a
    per-chunk property enforced inside the UDF.  A groupBy here shuffled
    ~600 rows/chunk for nothing (measured 110 s of a 165 s pipeline run
    at 100k pages — now ~0).  Cross-chunk aggregations downstream
    (term search) still do their own partial+final aggregation.
    """
    return chunks.select(
        "chunk_id", F.explode(_ngram_udf(F.col("text"))).alias("t")
    ).select(
        "chunk_id", F.col("t.term").alias("term"), F.col("t.type").alias("type")
    )


def term_counts_per_chunk(edges: DataFrame) -> DataFrame:
    """Per-chunk n-gram counts (cli/main.py:90-97 returns lens)."""
    return edges.groupBy("chunk_id", "type").agg(F.count("*").alias("n_terms"))
