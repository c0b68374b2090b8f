"""Triple extraction: sentence -> (subj, pred, obj) (SURVEY.md M3/F7/F8).

Reference: triplets.py:134-205 (T5 generate + string parse — the parse at
154-192 is ported verbatim in textproc.parse_triplet_output and defines
the output schema), triplets.py:207-218 (sanitize_relation),
triplets.py:355-359 (entity-name lowercasing at MERGE time).

The pandas UDF does sentence-split + marker-text generation + parse per
chunk; relation sanitization and name lowercasing are JVM-side column
expressions (regexp_replace/upper/lower — whole-stage codegen).

The ``mentions`` table materialized here fixes the reference's dead
MENTIONS_ENTITY branch (retrieval.py:244-250 matches an edge no code
ever writes).
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import textproc as tp

_TRIPLES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("subj", T.StringType()),
            T.StructField("pred", T.StringType()),
            T.StructField("obj", T.StringType()),
        ]
    )
)


@F.pandas_udf(_TRIPLES_TYPE)
def _triples_udf(texts: pd.Series) -> pd.Series:
    def one(text: str) -> List[Tuple[str, str, str]]:
        out: List[Tuple[str, str, str]] = []
        for sent in tp.sent_tokenize(text or ""):
            out.extend(tp.extract_triplets(sent))
        return out

    return texts.map(one)


def sanitize_relation_col(col: F.Column) -> F.Column:
    """JVM-side port of sanitize_relation (triplets.py:207-218):
    strip [^0-9a-zA-Z_ ], spaces -> '_', uppercase."""
    return F.upper(
        F.regexp_replace(F.regexp_replace(col, r"[^0-9a-zA-Z_ ]", ""), " ", "_")
    )


def triples_raw(chunks: DataFrame) -> DataFrame:
    """chunks (already language-filtered to 'en') ->
    triples_raw(chunk_id, subj, pred, obj).

    subj/obj lowercased (triplets.py:355-359), pred sanitized (F7).
    """
    return (
        chunks.select("chunk_id", "url", F.explode(_triples_udf(F.col("text"))).alias("t"))
        .select(
            "chunk_id",
            "url",
            F.lower(F.col("t.subj")).alias("subj"),
            sanitize_relation_col(F.col("t.pred")).alias("pred"),
            F.lower(F.col("t.obj")).alias("obj"),
        )
        .filter((F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != ""))
    )


def mentions(triples: DataFrame) -> DataFrame:
    """mentions(chunk_id, entity_name) = subjects ∪ objects per chunk."""
    subj = triples.select("chunk_id", F.col("subj").alias("entity_name"))
    obj = triples.select("chunk_id", F.col("obj").alias("entity_name"))
    return subj.unionByName(obj).dropDuplicates(["chunk_id", "entity_name"])
