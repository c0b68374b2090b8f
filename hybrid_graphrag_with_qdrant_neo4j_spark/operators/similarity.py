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
    """Exact cosine top-k: one scan, Arrow-batched numpy matvec scoring
    (E.cosine_vs_query_udf — the interpreted zip_with lambda measured
    ~100x slower), TakeOrderedAndProject for the distributed top-k.
    No shuffle beyond the k-row collect."""
    score = E.cosine_vs_query_udf(query_vec)
    return (
        embeddings.withColumn("score", score(F.col(emb_col)))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), F.round("score", 6).alias("score"))
    )


def _tables_planes(dim: int, bits: int, n_tables: int, seed: int = _ANN_SEED):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((dim, bits)) for _ in range(n_tables)]


def hyperplane_buckets_udf(dim: int, bits: int, n_tables: int, seed: int = _ANN_SEED):
    """Random-hyperplane bucket codes for ``n_tables`` independent hash
    tables, one Arrow pass (array<int> per row).  Multi-table LSH is the
    standard recall lever: a true neighbor missed by one table's cut is
    caught by another; candidate volume stays ~n_tables/2^bits of the
    data.  In a real deployment these codes are computed once at write
    time and stored as partition/cluster keys."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes = _tables_planes(dim, bits, n_tables, seed)
        weights = 1 << np.arange(bits)
        for embs in batches:
            if len(embs) == 0:
                yield pd.Series([], dtype="object")
                continue
            mat = np.stack(embs.to_numpy()).astype(np.float64)
            codes = [
                ((mat @ p) >= 0.0).astype(np.int64) @ weights for p in planes
            ]
            yield pd.Series(np.stack(codes, axis=1).astype(np.int32).tolist())

    return buckets


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: List[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = 8,
    n_tables: int = 4,
    hamming_radius: int = 1,
    dim: int | None = None,
    n_probes: int | None = None,  # back-compat alias: ignored, see n_tables
) -> DataFrame:
    """Multi-table LSH ANN: a row is a candidate if ANY of its
    ``n_tables`` hyperplane codes is within ``hamming_radius`` of the
    query's code for that table; candidates are re-ranked by exact
    cosine (numpy matvec UDF) and top-k'd via TakeOrderedAndProject.

    One scan, no shuffle before the k-row collect; the candidate filter
    is a codegen'd OR of bit_count(xor) tests over the code array.
    Recall gate: tests/test_streaming_multimodal.py asserts recall@10 vs
    brute force on the sf0.001 embeddings."""
    dim = dim or len(query_vec)
    qv = np.asarray([float(v) for v in query_vec], dtype=np.float64)
    weights = 1 << np.arange(bits)
    qcodes = [
        int(((qv @ p) >= 0.0).astype(np.int64) @ weights)
        for p in _tables_planes(dim, bits, n_tables)
    ]
    bucketed = embeddings.withColumn(
        "_codes", hyperplane_buckets_udf(dim, bits, n_tables)(F.col(emb_col))
    )
    cond = F.lit(False)
    for i, qc in enumerate(qcodes):
        cond = cond | (
            F.bit_count(F.element_at(F.col("_codes"), i + 1).bitwiseXOR(F.lit(qc)))
            <= hamming_radius
        )
    probe = bucketed.filter(cond)
    score = E.cosine_vs_query_udf([float(v) for v in query_vec])
    return (
        probe.withColumn("score", score(F.col(emb_col)))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), F.round("score", 6).alias("score"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: List[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroid_step: int = 50,
    n_probe: int = 3,
) -> DataFrame:
    """IVF-flat ANN with deterministically sampled centroids: rows whose
    ``id % centroid_step == 0`` are the coarse quantizer (a k-means-free
    stand-in with reproducible training — the centroid SET is a function
    of the table alone, so an external oracle can recompute the whole
    index).  Every vector is assigned to its nearest centroid by cosine
    (ties -> lower centroid id); the query probes its ``n_probe`` nearest
    centroids and exact-reranks only their inverted lists.

    Scale shape: the assignment is a write-time partition/cluster key at
    100 TB (vectors are stored bucketed by centroid; a query reads
    n_probe/K of the data).  Here assignment is one numpy matvec per
    Arrow batch against the broadcast centroid matrix; candidates are a
    codegen'd `isin` filter; rerank is the same broadcast-query matvec
    used by brute force; TakeOrderedAndProject does the distributed
    top-k.
    """
    cents = (
        embeddings.filter(F.col(id_col) % centroid_step == 0)
        .select(F.col(id_col).alias("cid"), F.col(emb_col).alias("cemb"))
        .collect()
    )
    cids = np.array([r["cid"] for r in cents])
    cmat = np.stack([np.asarray(r["cemb"], dtype=np.float64) for r in cents])
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0.0] = 1.0
    cunit = cmat / cnorm[:, None]
    order = np.argsort(cids)  # deterministic tie-break: lower centroid id
    cids, cunit = cids[order], cunit[order]

    qv = np.asarray([float(v) for v in query_vec], dtype=np.float64)
    qn = np.sqrt((qv * qv).sum()) or 1.0
    qsims = cunit @ (qv / qn)
    probe_ids = cids[np.argsort(-qsims, kind="stable")[:n_probe]].tolist()

    @F.pandas_udf(T.LongType())
    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for embs in batches:
            if len(embs) == 0:
                yield pd.Series([], dtype="int64")
                continue
            mat = np.stack(embs.to_numpy()).astype(np.float64)
            n = np.sqrt((mat * mat).sum(axis=1))
            n[n == 0.0] = 1.0
            sims = (mat / n[:, None]) @ cunit.T
            yield pd.Series(cids[np.argmax(sims, axis=1)].astype(np.int64))

    score = E.cosine_vs_query_udf([float(v) for v in query_vec])
    return (
        embeddings.withColumn("_centroid", assign(F.col(emb_col)))
        .filter(F.col("_centroid").isin(probe_ids))
        .withColumn("score", score(F.col(emb_col)))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), F.round("score", 6).alias("score"))
    )
