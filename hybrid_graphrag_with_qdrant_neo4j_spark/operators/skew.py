"""Hot-key skew handling: salted two-phase aggregation + skew-join
salting (SURVEY.md §4 custom work #2; north-rule requirement).

The corpus is Zipf-skewed by design (one entity in ~20% of triples,
stopword-adjacent terms in nearly every chunk).  Plain groupBy handles
moderate skew via map-side partial aggregation, but a reduce key whose
*partial* results still overwhelm one task (distinct-count state, large
collect_list) needs an explicit salt: aggregate on (key, salt) first —
spreading one hot key over S tasks — then re-aggregate on key.

These helpers are deterministic (salt = xxhash64 of a tiebreaker column,
never rand()) so output is reproducible and checkpoint-resume safe.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, tiebreak_col: str, num_salts: int = DEFAULT_SALTS,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, num_salts): hash of a high-cardinality
    tiebreaker column (e.g. chunk_id) — never rand(), so retries and
    resumed runs produce identical partitioning."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(num_salts))
    )


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    num_salts: int = DEFAULT_SALTS,
    out_col: str = "n_distinct",
) -> DataFrame:
    """countDistinct(distinct_col) per key, two-phase:
    phase 1 dedups (key, salt, value) — the hot key's distinct-state is
    spread across num_salts reducers; phase 2 merges per-salt partial
    distinct counts... which requires the value sets to be disjoint per
    salt, so the salt is derived FROM the distinct value itself."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(num_salts))
    )
    partial = (
        salted.groupBy(*keys, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    # value-derived salt => each distinct value lands in exactly one salt
    # bucket => partial counts are disjoint and sum exactly
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def salted_distinct(
    df: DataFrame,
    keys: Sequence[str],
    tiebreak_col: str | None = None,
    num_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Distinct rows on `keys`, two-phase.  The salt MUST come from a
    high-cardinality column that is NOT part of the dedup key
    (``tiebreak_col``) — a salt derived from the key itself is
    functionally dependent on it and spreads nothing (ADVICE r1).  Phase
    1 dedups (key, salt): the hot key's rows land on num_salts reducers;
    phase 2 sees at most num_salts rows per key."""
    if tiebreak_col is None:
        non_key = [c for c in df.columns if c not in keys]
        if not non_key:
            # nothing to salt from: map-side partial aggregation already
            # collapses duplicates before the single shuffle
            return df.select(*keys).groupBy(*keys).agg(F.lit(1).alias("_one")).drop("_one")
        tiebreak_col = non_key[0]
    salted = df.select(*keys, tiebreak_col).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.lit(1).alias("_one"))
    return partial.groupBy(*keys).agg(F.lit(1).alias("_one")).drop("_one")


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = DEFAULT_SALTS,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Skew-join by salting: the big (skewed) side gets a deterministic
    salt; the small side is exploded num_salts times so every
    (key, salt) partition finds its match.  Equivalent rows to
    ``big.join(small, key)``.  (AQE's skewJoin handles sort-merge skew
    automatically; this is the explicit form for when the small side is
    broadcast-sized and the big side's hot key must still split.)"""
    tb = tiebreak_col or big.columns[0]
    big_s = with_salt(big, tb, num_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return big_s.join(F.broadcast(small_s), [key, "_salt"]).drop("_salt")
