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
    # parquet naive timestamps arrive as TIMESTAMP_NTZ in Spark 4; route
    # through timestamp_ltz (session tz pinned to UTC) for epoch seconds —
    # floor-to-second semantics matches DuckDB's datediff('second', ...)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp_ltz"))
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp_ltz"))
    gapped = events.withColumn(
        "_new_session",
        F.when(
            epoch - F.coalesce(prev_epoch, F.lit(-(10**12))) > gap_minutes * 60,
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


def competitor_gap(events: DataFrame) -> DataFrame:
    """J11 (marketing_insights.py:83-104): brand-vs-competitor trend set
    ops.  'Trends' = distinct (event_type, day) pairs; the brand cohort is
    even user_ids, competitors odd.  Full-outer join + CASE tags each
    trend overlap / brand_only / competitor_only (the reference's
    missing/overlap/exclusive lists)."""
    base = events.select(
        "event_type", _day().alias("day"), (F.col("user_id") % 2 == 0).alias("is_brand")
    )
    brand = base.filter("is_brand").select("event_type", "day").distinct()
    comp = base.filter(~F.col("is_brand")).select("event_type", "day").distinct()
    b = brand.withColumn("b", F.lit(1))
    c = comp.withColumn("c", F.lit(1))
    joined = b.join(c, ["event_type", "day"], "full_outer")
    return joined.select(
        "event_type",
        "day",
        F.when(F.col("b").isNotNull() & F.col("c").isNotNull(), "overlap")
        .when(F.col("b").isNotNull(), "brand_only")
        .otherwise("competitor_only")
        .alias("status"),
    )


def impact_scores(events: DataFrame) -> DataFrame:
    """F14 (trend_detector.py:305-334 / marketing_insights.py:18-81
    shape): weighted sums with least/greatest clamps over per-type
    aggregates."""
    v = velocity(events)
    stats = v.groupBy("event_type").agg(
        F.sum("cnt").alias("total"),
        F.round(F.avg("velocity"), 6).alias("avg_velocity"),
    )
    adopters = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("adopters")
    )
    s = stats.join(adopters, "event_type")
    impact = (
        F.lit(0.5) * F.least(F.col("total") / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("adopters") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.2) * F.least(F.greatest(F.col("avg_velocity"), F.lit(0.0)), F.lit(1.0))
    )
    return s.select(
        "event_type", "total", "adopters", "avg_velocity",
        F.round(impact, 6).alias("impact"),
    )
