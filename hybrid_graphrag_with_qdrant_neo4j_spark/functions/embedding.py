"""Embedding UDFs + JVM-side vector math.

The reference embeds with SentenceTransformer E5 (common.py:50-98) and
caches the model per process (common.py:19-48).  Here:

  - ``embed_udf``: Arrow-batched Iterator pandas UDF — the iterator form
    is the Spark idiom for the reference's per-process model cache (any
    heavy model would be loaded once per python worker in the generator
    prologue).  Test mode uses the deterministic hash embedder.
  - dot / cosine / norms are JVM-side ``aggregate``/``zip_with`` column
    expressions (whole-stage codegen; no Python in the scoring hot path).
    Accumulation is sequential over the array, in double — bit-identical
    to the single-process oracle on float32 inputs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from .. import textproc as tp

EMBED_DIM = tp.EMBED_DIM


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # model-init-once-per-worker would go here (common.py:19-48 analogue)
    for texts in batches:
        yield texts.map(lambda t: tp.embed_text_py(t if t is not None else ""))


def embed(col: Column, prefix: str | None = None) -> Column:
    """Embed a text column.  ``prefix`` mirrors the reference's e5
    ``passage:``/``query:`` prefixes (common.py:73-82, retrieval.py:93);
    the hash embedder strips them, so it only documents intent here."""
    c = F.concat(F.lit(prefix), col) if prefix else col
    return embed_udf(c)


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with zero-norm guard (common.py:92-98 fallback)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


@F.pandas_udf(T.DoubleType())
def cosine_pairs_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized pairwise cosine for candidate-pair scoring.

    The JVM ``aggregate``/``zip_with`` lambdas are interpreted
    (~10-20µs/element — measured 420s for 780k 64-dim pairs); this
    numpy batch path is ~100x faster and is the hot path for LSH
    re-checks and near-dup verification.  float64 throughout; numpy's
    pairwise summation may differ from a sequential sum in the last ulp,
    which downstream users absorb by rounding (6dp) or by thresholds
    with real margins.
    """
    import numpy as np

    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = (A * B).sum(axis=1)
    na = np.sqrt((A * A).sum(axis=1))
    nb = np.sqrt((B * B).sum(axis=1))
    denom = na * nb
    out = np.where(denom == 0.0, 0.0, num / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(out)


def cosine_vs_query_udf(query_vec):
    """Arrow-batched cosine of every row's embedding against one fixed
    query vector: numpy matvec per batch (BLAS), the ~100x-faster
    replacement for the interpreted ``aggregate``/``zip_with`` scoring
    that CORRECTNESS_r01 flagged on the kNN hot path.  The query vector
    is closed over (tiny — serialized once into the UDF, broadcast with
    the task), so the scan stays a single pass with no join.

    At 768 dims x millions of rows per partition this is memory-bandwidth
    bound, exactly what a 1000-executor scan wants; the downstream
    ``orderBy(desc).limit(k)`` still compiles to TakeOrderedAndProject
    (per-partition partial top-k, k rows to the driver).
    """
    import numpy as np

    qv = np.asarray([float(v) for v in query_vec], dtype=np.float64)
    qn = float(np.sqrt((qv * qv).sum()))

    @F.pandas_udf(T.DoubleType())
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for embs in batches:
            if len(embs) == 0:
                yield pd.Series([], dtype="float64")
                continue
            M = np.stack(embs.to_numpy()).astype(np.float64)
            num = M @ qv
            denom = np.sqrt((M * M).sum(axis=1)) * qn
            yield pd.Series(
                np.where(denom == 0.0, 0.0, num / np.where(denom == 0.0, 1.0, denom))
            )

    return score


def query_vector_lit(text: str) -> Column:
    """Embed a query string driver-side into a literal column (tiny —
    broadcast into the scan, retrieval.py:79-105 semantics with the
    ``query:`` prefix)."""
    vec = tp.embed_text_py("query: " + text)
    return F.array(*[F.lit(v).cast("float") for v in vec])
