"""Temporal trend analytics sidecar (SURVEY.md A5-A12, F13-F15;
reference graphrag/core/trend_detector.py, trend_predictor.py,
marketing_insights.py).

The reference computes these with driver-side Python loops over
collected timestamps; here they are one groupBy + window functions —
pure built-ins, SQL-expressible (each has a DuckDB oracle in
__spark_entry__).  Operates on the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _day(col: str = "ts") -> F.Column:
    # string day key: engine-portable, hash-stable (A5; trend_detector.py:177-183
    # buckets by ts // 86400)
    return F.date_format(F.col(col), "yyyy-MM-dd")


def daily_counts(events: DataFrame) -> DataFrame:
    """A5: day-bucket frequency per event_type."""
    return (
        events.groupBy(F.col("event_type"), _day().alias("day"))
        .agg(F.count("*").alias("cnt"))
    )


def velocity(events: DataFrame) -> DataFrame:
    """A6: cnt - lag(cnt) per event_type over days (trend_detector.py:185-221)."""
    d = daily_counts(events)
    w = Window.partitionBy("event_type").orderBy("day")
    return d.withColumn("prev_cnt", F.lag("cnt").over(w)).withColumn(
        "velocity", F.col("cnt") - F.coalesce(F.col("prev_cnt"), F.lit(0))
    )


def distinct_adopters(events: DataFrame) -> DataFrame:
    """A7: distinct users per event_type per day (set(...) at
    trend_detector.py:243; approx_count_distinct is the drop-in at scale)."""
    return (
        events.groupBy("event_type", _day().alias("day"))
        .agg(F.countDistinct("user_id").alias("adopters"))
    )


def moving_average(events: DataFrame, periods: int = 3) -> DataFrame:
    """A8: mean of the last <=periods day-counts (trend_predictor.py:44-53)."""
    d = daily_counts(events)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(periods - 1), 0)
    )
    return d.withColumn("moving_avg", F.round(F.avg("cnt").over(w), 6))


def viral_coefficient(events: DataFrame) -> DataFrame:
    """A9: new_adopters / existing_prev with zero-guard
    (trend_predictor.py:144-160).  first-seen day per user via min(day)."""
    first_seen = events.groupBy("event_type", "user_id").agg(
        F.min(_day()).alias("first_day")
    )
    new_per_day = first_seen.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_adopters")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = new_per_day.withColumn(
        "existing_prev",
        F.coalesce(
            F.sum("new_adopters").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    return cum.withColumn(
        "viral_coefficient",
        F.when(F.col("existing_prev") == 0, F.lit(None).cast("double")).otherwise(
            F.round(F.col("new_adopters") / F.col("existing_prev"), 6)
        ),
    )


def classify_trends(events: DataFrame) -> DataFrame:
    """F13/F15-style rule cascade over per-type aggregates
    (trend_detector.py:248-303 shape: nested when/otherwise)."""
    stats = (
        velocity(events)
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("total"),
            F.round(F.avg("velocity"), 6).alias("avg_velocity"),
            F.max("cnt").alias("peak"),
        )
    )
    return stats.withColumn(
        "stage",
        F.when(F.col("avg_velocity") > 1.0, F.lit("growing"))
        .when(F.col("avg_velocity") < -1.0, F.lit("declining"))
        .otherwise(F.lit("stable")),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: new session when the gap from
    the previous event exceeds the threshold; cumulative-sum of
    boundaries = session index.  (Streaming twin: session_window in
    streaming/ingest.py.)"""
    w = Window.partitionBy("user_id").orderBy("ts")
    gapped = events.withColumn(
        "_new_session",
        F.when(
            F.col("ts").cast("long")
            - F.coalesce(F.lag("ts").over(w).cast("long"), F.lit(-10**12))
            > gap_minutes * 60,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return gapped.withColumn(
        "session_idx",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
