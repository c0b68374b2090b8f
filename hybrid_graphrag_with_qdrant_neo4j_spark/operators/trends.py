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

# Shared-base cache lifecycle (ADVICE r2): early_warnings / trend_impact
# persist their two tiny per-events bases (daily_counts, per_user_first_day)
# so one composite evaluates them once.  Spark's cache is keyed by logical
# plan, so repeated calls on the SAME events input share one entry — but
# calls over many DISTINCT inputs would accumulate executor-storage entries.
# Every persist is therefore registered here; long-lived callers iterating
# over many event tables call release_caches() between inputs.  Entries are
# O(types x days) / O(types x users) — eviction is a correctness no-op.
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df.persist()


def _persist_by_type(df: DataFrame) -> DataFrame:
    """Persist a shared per-event_type base ALREADY partitioned on
    event_type with the session's shuffle-partition count: every
    downstream window (partitionBy event_type) and per-type groupBy then
    reads the cache with its required partitioning in place and elides
    its own exchange — the composites' plans drop ~6 tiny shuffles
    (guide §2.4: two operations keyed the same way share one exchange).
    Row-identical to a plain persist."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return _persist(df.repartition(n, F.col("event_type")))


def release_caches() -> None:
    """Unpersist every shared base persisted by this module (blocking=False;
    plan-keyed dedup means double-unpersist of the same plan is harmless)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


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


def per_user_first_day(events: DataFrame) -> DataFrame:
    """Shared base: per (event_type, user) first-seen day.  Adopter
    counts, influence averages and viral-coefficient cohorts are all
    projections of this ONE aggregate — composites pass it down so the
    physical plan scans/shuffles events once for the whole family
    (trend_impact measured 22 parquet scans before the sharing, 2
    logical bases after)."""
    return events.groupBy("event_type", "user_id").agg(
        F.min(_day()).alias("first_day")
    )


def velocity(events: DataFrame, daily: DataFrame | None = None) -> DataFrame:
    """A6: cnt - lag(cnt) per event_type over days (trend_detector.py:185-221)."""
    d = daily if daily is not None else daily_counts(events)
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


def viral_coefficient(
    events: DataFrame, per_user: DataFrame | None = None
) -> DataFrame:
    """A9: new_adopters / existing_prev with zero-guard
    (trend_predictor.py:144-160).  first-seen day per user via min(day)."""
    first_seen = per_user if per_user is not None else per_user_first_day(events)
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


# ---------------------------------------------------------------------------
# Trend-detector / trend-predictor / marketing-insights tail
# (VERDICT r1 "What's missing" #3-#5).  Trend = event_type; creator =
# user_id; velocity/occurrences per the detector's scalar inputs.
# All built-in column arithmetic — each has a DuckDB oracle twin.
# ---------------------------------------------------------------------------


def latest_velocity(events: DataFrame, daily: DataFrame | None = None) -> DataFrame:
    """The scalar 'velocity' the detector passes around (trend_detector.py
    evaluates rules on the current velocity, not the average): the most
    recent day's count delta per event_type."""
    v = velocity(events, daily)
    w = Window.partitionBy("event_type").orderBy(F.desc("day"))
    return (
        v.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", F.col("velocity").alias("latest_velocity"))
    )


def _type_totals(events: DataFrame, daily: DataFrame | None = None) -> DataFrame:
    d = daily if daily is not None else daily_counts(events)
    return d.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_days")
    )


def lifecycle_stages(events: DataFrame, daily: DataFrame | None = None) -> DataFrame:
    """F15: the reference's 5-stage lifecycle rule table, ported
    threshold-for-threshold (trend_detector.py:336-363):
    velocity>1 & occ<50 -> emerging; velocity>0.5 & occ>=50 -> peaking;
    |velocity|<=0.5 & occ>20 -> stable; velocity<-0.5 -> declining;
    else unknown.  Rule order preserved (elif cascade = when chain)."""
    s = _type_totals(events, daily).join(latest_velocity(events, daily), "event_type")
    v, total = F.col("latest_velocity"), F.col("total")
    return s.select(
        "event_type",
        "total",
        v.cast("double").alias("latest_velocity"),
        F.when((v > 1.0) & (total < 50), "emerging")
        .when((v > 0.5) & (total >= 50), "peaking")
        .when((F.abs(v) <= 0.5) & (total > 20), "stable")
        .when(v < -0.5, "declining")
        .otherwise("unknown")
        .alias("stage"),
    )


def confidence_scores(events: DataFrame) -> DataFrame:
    """F14: detector confidence (trend_detector.py:305-334):
    0.4*min(occ/100,1) + 0.4*min(adoption/10,1) + 0.2*(|v|/5 clamped,
    0 when v==0), clamped to [0,1]."""
    s = _type_totals(events).join(latest_velocity(events), "event_type")
    adopters = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("adopters")
    )
    s = s.join(adopters, "event_type")
    v = F.col("latest_velocity")
    score = (
        F.lit(0.4) * F.least(F.col("total") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * F.least(F.col("adopters") / F.lit(10.0), F.lit(1.0))
        + F.lit(0.2)
        * F.when(v == 0, F.lit(0.0)).otherwise(
            F.least(F.abs(v) / F.lit(5.0), F.lit(1.0))
        )
    )
    return s.select(
        "event_type",
        "total",
        "adopters",
        v.cast("double").alias("latest_velocity"),
        F.round(F.greatest(F.lit(0.0), F.least(score, F.lit(1.0))), 6).alias(
            "confidence"
        ),
    )


def time_series_prediction(events: DataFrame, daily: DataFrame | None = None) -> DataFrame:
    """Trend-predictor time-series analysis (trend_predictor.py:40-59):
    predicted next-period frequency = mean of the last <=3 day-counts;
    confidence 0.5 when >3 observed days else 0.2; <2 days ->
    insufficient_data with prediction 0."""
    d = daily if daily is not None else daily_counts(events)
    w = Window.partitionBy("event_type").orderBy(F.desc("day"))
    recent = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("cnt"), 6).alias("_recent_avg"),
            F.count("*").alias("_n_recent"),
        )
    )
    s = _type_totals(events, d).join(recent, "event_type")
    few = F.col("n_days") < 2
    return s.select(
        "event_type",
        F.col("n_days").alias("n_days"),
        F.when(few, F.lit(0.0)).otherwise(F.col("_recent_avg")).alias("predicted"),
        F.when(few, F.lit(0.0))
        .when(F.col("n_days") > 3, F.lit(0.5))
        .otherwise(F.lit(0.2))
        .alias("confidence"),
        F.when(few, F.lit("insufficient_data"))
        .otherwise(
            F.concat(F.lit("average_last_"), F.col("_n_recent"), F.lit("_periods"))
        )
        .alias("method"),
    )


def influence_col(user_col: F.Column) -> F.Column:
    """Creator-influence lookup (trend_predictor.py:61-84 mock-score map,
    default 0.4 for unknown creators) keyed on user_id % 10."""
    bank = [0.8, 0.6, 0.9, 0.7, 0.5, 0.85]
    m = user_col % 10
    c = F.lit(0.4)
    for i in range(len(bank) - 1, -1, -1):
        c = F.when(m == i, F.lit(bank[i])).otherwise(c)
    return c


def influence_weighted_prediction(
    events: DataFrame,
    daily: DataFrame | None = None,
    per_user: DataFrame | None = None,
) -> DataFrame:
    """A10 + trend_predictor.py:86-121: mean creator influence over the
    trend's adopters, then prediction x (1 + (avg-0.5)*0.2) and
    confidence x (1 + (avg-0.5)*0.1) clamped to [0,1]."""
    pred = time_series_prediction(events, daily)
    pu = per_user if per_user is not None else per_user_first_day(events)
    infl = (
        pu.select("event_type", "user_id")
        .groupBy("event_type")
        .agg(F.round(F.avg(influence_col(F.col("user_id"))), 6).alias("avg_influence"))
    )
    s = pred.join(infl, "event_type")
    a = F.col("avg_influence")
    return s.select(
        "event_type",
        "predicted",
        "avg_influence",
        F.round(F.col("predicted") * (F.lit(1.0) + (a - 0.5) * 0.2), 6).alias(
            "predicted_adj"
        ),
        F.round(
            F.least(
                F.greatest(
                    F.col("confidence") * (F.lit(1.0) + (a - 0.5) * 0.1), F.lit(0.0)
                ),
                F.lit(1.0),
            ),
            6,
        ).alias("confidence_adj"),
    )


def latest_viral_coefficient(
    events: DataFrame, per_user: DataFrame | None = None
) -> DataFrame:
    """Latest-day K-factor per event_type with the reference's zero-base
    rule (trend_predictor.py:152-157): existing_prev==0 -> K = new
    adopters if any, else 0."""
    cum = viral_coefficient(events, per_user)
    w = Window.partitionBy("event_type").orderBy(F.desc("day"))
    latest = cum.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    k = F.when(
        F.col("existing_prev") == 0,
        F.when(F.col("new_adopters") > 0, F.col("new_adopters").cast("double")).otherwise(
            F.lit(0.0)
        ),
    ).otherwise(F.col("new_adopters") / F.col("existing_prev"))
    return latest.select("event_type", F.round(k, 6).alias("viral_k"))


def early_warnings(events: DataFrame) -> DataFrame:
    """Early-warning cascade (trend_predictor.py:162-213), rule-for-rule:
    r1 velocity>2 & predicted>5 -> medium; r2 K>1 -> high if already
    medium else medium; r3 velocity>3 & K>1.5 & predicted>10 -> critical;
    no rule fired -> no warning row (the reference returns None)."""
    # persist the two tiny shared bases: column pruning otherwise
    # specializes each consumer's copy of the subtree (different
    # ReadSchema -> no exchange reuse) and the events table is scanned
    # once per consumer.  Both aggregates are O(types x days) and
    # O(types x users) — small at any corpus scale.  Spark's cache is
    # keyed by logical plan, so repeated calls share one entry; see
    # release_caches() for the lifecycle across distinct inputs.
    daily = _persist_by_type(daily_counts(events))
    per_user = _persist_by_type(per_user_first_day(events))
    s = (
        latest_velocity(events, daily)
        .join(influence_weighted_prediction(events, daily, per_user), "event_type")
        .join(latest_viral_coefficient(events, per_user), "event_type")
    )
    v, k, p = F.col("latest_velocity"), F.col("viral_k"), F.col("predicted_adj")
    r1 = (v > 2.0) & (p > 5.0)
    r2 = k > 1.0
    r3 = (v > 3.0) & (k > 1.5) & (p > 10.0)
    level = (
        F.when(r3, "critical")
        .when(r1 & r2, "high")
        .when(r1 | r2, "medium")
        .otherwise("low")
    )
    n_reasons = r1.cast("int") + r2.cast("int") + r3.cast("int")
    return (
        s.select(
            "event_type",
            level.alias("warning_level"),
            F.col("predicted_adj").alias("predicted"),
            v.cast("double").alias("velocity"),
            "viral_k",
            n_reasons.alias("n_reasons"),
        )
        .filter(F.col("n_reasons") > 0)
    )


def _clamp01(c: F.Column) -> F.Column:
    return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))


def trend_impact(events: DataFrame) -> DataFrame:
    """Marketing impact formulas (marketing_insights.py:18-81), weights
    and clamps verbatim; trend-type engagement/longevity factor tables
    keyed on event_type (the reference keys on TrendType)."""
    daily = _persist_by_type(daily_counts(events))   # see early_warnings note
    per_user = _persist_by_type(per_user_first_day(events))
    s = (
        _type_totals(events, daily)
        .join(latest_velocity(events, daily), "event_type")
        .join(
            # countDistinct(user) == count of per-user groups: one more
            # projection of the shared per_user base, not a new scan
            per_user.groupBy("event_type").agg(F.count("*").alias("adopters")),
            "event_type",
        )
        .join(influence_weighted_prediction(events, daily, per_user), "event_type")
        .join(latest_viral_coefficient(events, per_user), "event_type")
        .join(lifecycle_stages(events, daily).select("event_type", "stage"), "event_type")
    )
    et = F.col("event_type")
    occ = _clamp01(F.col("total") / 200.0)
    vel = _clamp01(F.abs(F.col("latest_velocity")) / 5.0)
    pf = _clamp01(F.col("predicted_adj") / 50.0)
    vir = _clamp01(F.col("viral_k") / 2.0)
    infl = _clamp01(F.col("avg_influence"))
    adop = _clamp01(F.col("adopters") / 20.0)
    # engagement factor table (FORMAT/TECHNIQUE .8, AESTHETIC/INGREDIENT .6)
    type_eng = (
        F.when(et.isin("view", "click"), 0.8)
        .when(et.isin("purchase", "signup"), 0.6)
        .otherwise(0.5)
    )
    # longevity factor table (CUISINE/NUTRITIONAL .8, INGREDIENT/TECHNIQUE
    # .6, AESTHETIC/FORMAT .3)
    type_lon = (
        F.when(et.isin("purchase", "signup"), 0.8)
        .when(et == "click", 0.6)
        .when(et == "view", 0.3)
        .otherwise(0.5)
    )
    life = (
        F.when(F.col("stage") == "emerging", 0.7)
        .when(F.col("stage") == "peaking", 0.8)
        .when(F.col("stage") == "stable", 0.9)
        .when(F.col("stage") == "declining", 0.2)
        .otherwise(0.5)
    )
    views = (0.25 * occ + 0.25 * vel + 0.20 * pf + 0.15 * vir + 0.15 * infl) * 10
    engagement = (0.35 * adop + 0.25 * vel + 0.20 * vir + 0.20 * type_eng) * 10
    longevity = (0.4 * life + 0.3 * pf + 0.3 * type_lon) * 10

    def out10(c):
        return F.round(F.greatest(F.lit(0.0), F.least(c, F.lit(10.0))), 1)

    return s.select(
        "event_type",
        out10(views).alias("views_potential"),
        out10(engagement).alias("engagement_potential"),
        out10(longevity).alias("longevity_potential"),
    )


def roi_prediction(events: DataFrame, investment: str = "medium") -> DataFrame:
    """ROI scoring (marketing_insights.py:144-152): return =
    0.4*views+0.4*engagement+0.2*longevity clamped to 10; cost map
    low/medium/high = 3/6/9 (unknown 7); scaled = raw/(10/3)*10."""
    cost = {"low": 3.0, "medium": 6.0, "high": 9.0}.get(investment, 7.0)
    imp = trend_impact(events)
    ret = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                0.4 * F.col("views_potential")
                + 0.4 * F.col("engagement_potential")
                + 0.2 * F.col("longevity_potential"),
                F.lit(10.0),
            ),
        ),
        1,
    )
    scaled = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(F.col("potential_return_score") / cost / (10.0 / 3.0) * 10.0, F.lit(10.0)),
        ),
        1,
    )
    out = imp.withColumn("potential_return_score", ret).withColumn(
        "estimated_roi_score", scaled
    )
    return out.select(
        "event_type",
        F.lit(investment).alias("estimated_investment"),
        "potential_return_score",
        "estimated_roi_score",
        F.when(F.col("estimated_roi_score") > 7, "High")
        .when(F.col("estimated_roi_score") > 4, "Medium")
        .otherwise("Low")
        .alias("roi_category"),
    )


def trend_dashboard(events: DataFrame) -> DataFrame:
    """A12: dashboard bucketing (marketing_insights.py:154-169):
    peaking & v>1 -> trending_now; emerging & v>0 -> emerging_soon;
    stable -> stable_trends; declining -> declining_trends; other stages
    dropped.  collect_list serialized as a sorted comma-join so the
    result is hashable and order-insensitive."""
    s = lifecycle_stages(events)
    cat = (
        F.when((F.col("stage") == "peaking") & (F.col("latest_velocity") > 1), "trending_now")
        .when((F.col("stage") == "emerging") & (F.col("latest_velocity") > 0), "emerging_soon")
        .when(F.col("stage") == "stable", "stable_trends")
        .when(F.col("stage") == "declining", "declining_trends")
    )
    return (
        s.withColumn("category", cat)
        .filter(F.col("category").isNotNull())
        .groupBy("category")
        .agg(
            F.count("*").alias("n_trends"),
            F.concat_ws(",", F.sort_array(F.collect_list("event_type"))).alias(
                "trend_types"
            ),
        )
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
