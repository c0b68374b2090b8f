"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and LSH-bucketed ANN (scale path).

Not in the reference beyond its Qdrant kNN calls (S5,
qdrant_connection.py:154-180); these make the engine self-contained.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import embedding as E

_ANN_SEED = 1337


def _query_lit(query_vec: List[float]):
    return F.array(*[F.lit(float(v)).cast("float") for v in query_vec])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: List[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, JVM dot product, TakeOrderedAndProject.
    No shuffle beyond the k-row collect."""
    q = _query_lit(query_vec)
    return (
        embeddings.withColumn("score", E.cosine(F.col(emb_col), q))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), F.round("score", 6).alias("score"))
    )


def hyperplane_bucket_udf(dim: int, bits: int, seed: int = _ANN_SEED):
    """Random-hyperplane coarse bucket id (int) for an embedding column."""

    @F.pandas_udf(T.IntegerType())
    def bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, bits))
        weights = 1 << np.arange(bits)
        for embs in batches:
            mat = np.stack(embs.to_numpy()).astype(np.float64)
            b = (mat @ planes) >= 0.0
            yield pd.Series((b * weights).sum(axis=1).astype(np.int32))

    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: List[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = 8,
    n_probes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: score only rows whose hyperplane bucket is within
    the ``n_probes`` nearest buckets of the query's bucket (by hamming
    distance of the bucket codes).  The bucket column is computable once
    and persisted/partitioned in a real deployment, turning top-k into a
    partition-pruned scan of ~n_probes/2^bits of the data."""
    dim = dim or len(query_vec)
    rng = np.random.default_rng(_ANN_SEED)
    planes = rng.standard_normal((dim, bits))
    qb = int(
        (((np.asarray(query_vec, dtype=np.float64) @ planes) >= 0.0) * (1 << np.arange(bits))).sum()
    )
    bucketed = embeddings.withColumn(
        "_bucket", hyperplane_bucket_udf(dim, bits)(F.col(emb_col))
    )
    # probe buckets = hamming distance < limit from query bucket
    max_hamming = max(int(np.ceil(np.log2(max(n_probes, 1)))), 1)
    probe = bucketed.filter(
        F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qb))) <= max_hamming
    )
    q = _query_lit([float(v) for v in query_vec])
    return (
        probe.withColumn("score", E.cosine(F.col(emb_col), q))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), F.round("score", 6).alias("score"))
    )
