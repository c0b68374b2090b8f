"""Entity linking: LSH blocking + exact cosine threshold (SURVEY.md J5/J6).

Reference semantics (triplets.py:252-343): an entity merges with
  (a) entities whose lowercase name matches exactly (equi-join — free,
      since our entity node key IS the lowercase name), and
  (b) entities whose embedding cosine >= 0.96 (triplets.py:257-261).
The reference capped (b) at the top-10 vector-search hits; our blocking
is recall-complete at the threshold instead (a strict superset of the
reference's merges — documented in BENCH/BASELINE.md).

Scale shape: random-hyperplane signatures (signed projections against a
seeded plane matrix, numpy matmul inside an Arrow UDF) -> explode one row
per band -> self-join on (band, signature) -> exact cosine re-check
JVM-side.  Banding keeps the self-join selective: unrelated vectors agree
per bit with p=0.5, so a b-bit band collides at 2^-b; near-duplicates at
cosine 0.96 agree per bit with p≈0.91, so B bands of b bits give recall
1-(1-0.91^b)^B (defaults b=12, B=32 -> miss ≈ 4e-6).  AQE skew-join
handles hot buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import embedding as E

LINK_THRESHOLD = 0.96
DEFAULT_BANDS = 32
DEFAULT_BITS = 12
_LSH_SEED = 42


def entity_nodes(triples: DataFrame) -> DataFrame:
    """Distinct lowercase entity names + embeddings.
    entities(name, embedding)."""
    names = (
        triples.select(F.col("subj").alias("name"))
        .unionByName(triples.select(F.col("obj").alias("name")))
        .dropDuplicates(["name"])
    )
    return names.withColumn("embedding", E.embed(F.col("name"), prefix="passage: "))


def _signature_udf(dim: int, num_bands: int, bits: int):
    n_planes = num_bands * bits

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def signatures(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng = np.random.default_rng(_LSH_SEED)
        planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
        weights = (1 << np.arange(bits, dtype=np.int64))
        for embs in batches:
            mat = np.stack(embs.to_numpy())  # (n, dim) float32
            bits_mat = (mat.astype(np.float64) @ planes) >= 0.0  # (n, n_planes)
            per_band = bits_mat.reshape(len(embs), num_bands, bits)
            sigs = (per_band * weights).sum(axis=2)  # (n, num_bands) int64
            yield pd.Series(list(sigs))

    # Optimizer barrier, NOT a semantics statement: the UDF is pure.
    # Without it, Catalyst pushes posexplode's size(sig)>0 filter — and
    # with it this UDF chained on embed_udf — BELOW the entity dedup
    # aggregate, re-embedding every raw mention instead of every
    # distinct entity (measured 40-75 s vs 4.5 s at 24k pages / 280k
    # mentions / 36 entities; at 10^12 docs it is the difference between
    # embedding ~10^9 entities and ~10^13 mentions).  Nondeterministic
    # expressions are never pushed through aggregates.
    return signatures.asNondeterministic()


def similarity_pairs(
    entities: DataFrame,
    threshold: float = LINK_THRESHOLD,
    num_bands: int = DEFAULT_BANDS,
    bits: int = DEFAULT_BITS,
    dim: int = E.EMBED_DIM,
) -> DataFrame:
    """Candidate blocking + exact re-check -> pairs(name_a, name_b) with
    cosine >= threshold, name_a < name_b.  Exact re-check keeps precision
    identical to the reference's threshold (SURVEY.md §7 hard parts)."""
    sigs = entities.withColumn(
        "sig", _signature_udf(dim, num_bands, bits)(F.col("embedding"))
    ).select(
        "name",
        "embedding",
        F.posexplode("sig").alias("band", "band_sig"),
    )
    left = sigs.alias("l")
    right = sigs.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.name") < F.col("r.name")),
        )
        .select(
            F.col("l.name").alias("name_a"),
            F.col("r.name").alias("name_b"),
            F.col("l.embedding").alias("emb_a"),
            F.col("r.embedding").alias("emb_b"),
        )
        .dropDuplicates(["name_a", "name_b"])  # same pair from many bands
    )
    return (
        cand.withColumn("cos", E.cosine_pairs_udf(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("name_a", "name_b")
    )


def incremental_similarity_pairs(
    new_entities: DataFrame,
    all_entities: DataFrame,
    threshold: float = LINK_THRESHOLD,
    num_bands: int = DEFAULT_BANDS,
    bits: int = DEFAULT_BITS,
    dim: int = E.EMBED_DIM,
) -> DataFrame:
    """Candidate pairs TOUCHING a new entity: block the (small) new-name
    side against the full table instead of re-running the n x n self-join
    per ingest batch (VERDICT r3 next-round #5 — incremental linking).

    Same seeded hyperplanes / band structure / exact cosine re-check as
    :func:`similarity_pairs`, so a pair found here is exactly the pair
    the full rebuild would find; pairs among untouched existing names
    are (correctly) not re-derived — their components are already
    collapsed in the entities table.  At 10^12 scale the existing side's
    signatures are precomputed at write time (a column of the entities
    table); here they are recomputed in one Arrow pass over the scan.

    Returns pairs(name_a, name_b), name_a < name_b, >=1 new endpoint."""
    sig = _signature_udf(dim, num_bands, bits)

    def with_sigs(df, prefix):
        return df.withColumn("sig", sig(F.col("embedding"))).select(
            F.col("name").alias(f"{prefix}_name"),
            F.col("embedding").alias(f"{prefix}_emb"),
            F.posexplode("sig").alias(f"{prefix}_band", f"{prefix}_sig"),
        )

    n = with_sigs(new_entities, "n")
    a = with_sigs(all_entities, "a")
    cand = (
        n.join(
            a,
            (F.col("n_band") == F.col("a_band"))
            & (F.col("n_sig") == F.col("a_sig"))
            & (F.col("n_name") != F.col("a_name")),
        )
        .select(
            F.least("n_name", "a_name").alias("name_a"),
            F.greatest("n_name", "a_name").alias("name_b"),
            F.col("n_emb").alias("emb_a"),
            F.col("a_emb").alias("emb_b"),
        )
        .dropDuplicates(["name_a", "name_b"])
    )
    return (
        cand.withColumn("cos", E.cosine_pairs_udf(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("name_a", "name_b")
    )


def incremental_similarity_pairs_bruteforce(
    new_entities: DataFrame,
    all_entities: DataFrame,
    threshold: float = LINK_THRESHOLD,
) -> DataFrame:
    """Exact one-sided pair generation: new x all cross-scoring with >=1
    new endpoint — the append-path twin of
    :func:`similarity_pairs_bruteforce`.  ``plans.incremental``
    dispatches here below the same size gate build_kg uses for exact
    pairing, so append_batch's SET-EQUAL-to-rebuild invariant is EXACT
    at that scale (ADVICE r4: banded blocking misses a true >=threshold
    pair with ~1e-5 probability per pair; the rebuild's exact path would
    merge it, the banded append would not).  The new side is small by
    construction, so AQE broadcasts it; cost is O(|new| x |all|) exact
    cosines — the gate keeps that bounded."""
    n = new_entities.select(
        F.col("name").alias("n_name"), F.col("embedding").alias("n_emb")
    )
    a = all_entities.select(
        F.col("name").alias("a_name"), F.col("embedding").alias("a_emb")
    )
    return (
        n.join(a, F.col("n_name") != F.col("a_name"))
        .select(
            F.least("n_name", "a_name").alias("name_a"),
            F.greatest("n_name", "a_name").alias("name_b"),
            F.col("n_emb").alias("emb_a"),
            F.col("a_emb").alias("emb_b"),
        )
        .dropDuplicates(["name_a", "name_b"])
        .withColumn("cos", E.cosine_pairs_udf(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("name_a", "name_b")
    )


def similarity_pairs_bruteforce(
    entities: DataFrame, threshold: float = LINK_THRESHOLD
) -> DataFrame:
    """O(n^2) exact pair generation — the degraded plan for tiny entity
    sets (mirrors the reference's no-vector-index fallback,
    triplets.py:310-343, where blocking is unnecessary)."""
    a = entities.select(F.col("name").alias("name_a"), F.col("embedding").alias("emb_a"))
    b = entities.select(F.col("name").alias("name_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .withColumn("cos", E.cosine_pairs_udf(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("name_a", "name_b")
    )


def local_entity_resolution(
    entities: DataFrame, threshold: float = LINK_THRESHOLD
):
    """Driver-local linking + canonicalization for small entity sets.

    The linking stage is scale-adaptive (the reference's own
    capability-detection idiom, triplets.py:58-90): below
    ``local_under`` distinct entities the whole similarity matrix fits
    the driver (10k names x 768 floats = 30 MB; one BLAS matmul), so a
    dozen tiny Spark jobs (pair join + hash-min CC rounds) collapse into
    one collect + one broadcast-able mapping.  Above the threshold the
    distributed LSH + connected-components path engages.  Results are
    identical (same threshold, same lexicographic-min canonical rule).

    Returns (mapping, pairs): mapping = list[(name, canonical_id)] for
    every entity; pairs = list[(name_a, name_b)] with cosine >= threshold
    and name_a < name_b (identical semantics to
    ``similarity_pairs_bruteforce``).
    """
    rows = entities.select("name", "embedding").collect()
    names = [r["name"] for r in rows]
    if not names:
        return [], []
    order = np.argsort(np.array(names, dtype=object))
    names = [rows[i]["name"] for i in order]
    mat = np.stack([rows[i]["embedding"] for i in order]).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sim = unit @ unit.T

    parent = list(range(len(names)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = []
    ii, jj = np.where(sim >= threshold)
    for a, b in zip(ii.tolist(), jj.tolist()):
        if a < b:
            pairs.append((names[a], names[b]))
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # names sorted -> min index == min name
    mapping = [(names[i], names[find(i)]) for i in range(len(names))]
    return mapping, pairs
