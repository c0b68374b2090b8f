"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §1.1 Video/Frame sidecar;
video_ingest.py:32-306).

The decode/feature libraries (cv2, PIL, ffmpeg) are NOT in this
container, so the decode kernels are STUBBED with deterministic fakes
behind ``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partitioning, UDF signatures) is real and tested; swapping in a real
decoder changes only the marked inner functions.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_number", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(raw: bytes) -> tuple:
    """STUB decoder — deterministic fake (no image libs in container).
    Real impl: cv2.imdecode / PIL.Image.open.  Raises on empty payload
    the way a real decoder errors on truncated bytes.  md5-derived (not
    crc32) so the DuckDB oracle can recompute the decode from the raw
    payload — md5 is the only hash shared by Python/Spark/DuckDB."""
    if not raw:
        raise ValueError("empty image payload")
    h = int(hashlib.md5(raw).hexdigest()[:8], 16)
    width, height = 64 + h % 64, 64 + (h >> 8) % 64
    feat = [((h >> (i % 24)) % 251) / 251.0 for i in range(16)]
    return width, height, feat


def extract_frame_features(frames: DataFrame) -> DataFrame:
    """frames(asset_id, frame_number, payload binary) -> typed features.

    mapInPandas: Arrow batches in/out, decode stays columnar-adjacent —
    the exact shape a real CV featurizer needs (model init once per
    partition in the generator prologue)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavy model init would go here, once per partition
        for pdf in batches:
            rows = []
            for asset_id, frame_number, payload in zip(
                pdf["asset_id"], pdf["frame_number"], pdf["payload"]
            ):
                w, h, feat = _decode_image_stub(bytes(payload) if payload is not None else b"")
                rows.append((asset_id, int(frame_number), w, h, feat))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_number", "width", "height", "feature"]
            )

    return frames.mapInPandas(run, FRAME_FEATURES_SCHEMA)


def sample_frames(frames: DataFrame, every_nth: int) -> DataFrame:
    """Frame sampler (video_ingest.py:32-101): a modulo predicate — pushed
    into the scan, no UDF."""
    return frames.filter(F.col("frame_number") % every_nth == 0)


def temporal_segments(
    frames: DataFrame, fps: float, segment_duration: float = 5.0
) -> DataFrame:
    """5-second segment bucketing (video_ingest.py:103-175): with evenly
    sampled frames the reference's close-on-crossing rule equals fixed
    bucketing on floor(timestamp/duration); temporal_index = dense order
    of segments per asset (video_ingest.py:253)."""
    ts = F.col("frame_number") / F.lit(fps)
    seg = frames.withColumn("segment_id", F.floor(ts / F.lit(segment_duration)).cast("int"))
    agg = seg.groupBy("asset_id", "segment_id").agg(
        F.min(ts).alias("start_time"),
        F.max(ts).alias("end_time"),
        F.count("*").alias("n_frames"),
    )
    w = Window.partitionBy("asset_id").orderBy("segment_id")
    agg = agg.withColumn("temporal_index", F.row_number().over(w) - 1)
    # BEFORE/AFTER chaining (video_ingest.py:296-306) via lead/lag
    return agg.withColumn(
        "next_segment_id", F.lead("segment_id").over(w)
    ).withColumn("prev_segment_id", F.lag("segment_id").over(w))


SEGMENTS_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("segment_index", T.IntegerType()),
        T.StructField("start_time", T.DoubleType()),
        T.StructField("end_time", T.DoubleType()),
        T.StructField("frame_count", T.IntegerType()),
    ]
)


def segment_frames_py(timestamps, segment_duration: float):
    """Pure-python port of the reference's close-on-crossing segmenter
    (video_ingest.py:130-175): a segment closes when the NEXT frame's
    timestamp minus the segment start reaches ``segment_duration`` (or at
    the last frame); the next segment starts at that next frame's
    timestamp.  Exact for UNEVEN frame timestamps, where fixed
    floor(ts/duration) bucketing diverges.  Shared by the Spark UDF and
    the pytest oracle (parity by construction)."""
    ts = sorted(timestamps)
    if not ts:
        return []
    out = []
    seg_idx = 0
    start = ts[0]
    count = 0
    for i, t in enumerate(ts):
        count += 1
        last = i == len(ts) - 1
        if last or ts[i + 1] - start >= segment_duration:
            out.append((seg_idx, start, t, count))
            seg_idx += 1
            count = 0
            if not last:
                start = ts[i + 1]
    return out


def temporal_segments_exact(
    frames: DataFrame, fps: float, segment_duration: float = 5.0
) -> DataFrame:
    """Exact-parity temporal segmentation: the segmenter is sequential
    *within* a video and embarrassingly parallel *across* videos, so
    ``applyInPandas`` over asset_id is the Spark shape (one Arrow batch
    per video; never split one video's frames across partitions).  Use
    ``temporal_segments`` (fixed bucketing, pure codegen, no UDF) when
    frames are evenly sampled — the two agree there by construction."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        asset = pdf["asset_id"].iloc[0]
        ts = (pdf["frame_number"] / fps).tolist()
        rows = [
            (asset, idx, start, end, n)
            for idx, start, end, n in segment_frames_py(ts, segment_duration)
        ]
        return pd.DataFrame(
            rows,
            columns=["asset_id", "segment_index", "start_time", "end_time", "frame_count"],
        )

    return frames.groupBy("asset_id").applyInPandas(run, SEGMENTS_EXACT_SCHEMA)


def synthetic_frames(spark, n_assets: int = 4, frames_per_asset: int = 50) -> DataFrame:
    """Deterministic fake binary payloads for tests (no external data)."""
    rows = [
        (f"asset{a}", i, (f"asset{a}:frame{i}".encode("utf-8")) * 3)
        for a in range(n_assets)
        for i in range(frames_per_asset)
    ]
    return spark.createDataFrame(
        rows, "asset_id string, frame_number int, payload binary"
    )


def synthetic_visual_assets(spark, n: int = 300) -> DataFrame:
    """Deterministic stand-in for the reference's visual-trend collection
    (trend_detector.py:40,92-116: 512-d embeddings with payload columns
    ingredients / tags[] / objects[])."""
    import datetime as dt

    tags_bank = [["pasta", "cheese"], ["sushi", "rice"], ["taco", "salsa"],
                 ["cheese", "bread"], ["rice", "curry"]]
    objs_bank = [["pan", "knife"], ["bowl"], ["plate", "fork"], ["pot"]]
    rows = []
    for i in range(n):
        h = zlib.crc32(f"asset{i}".encode())
        rows.append((
            f"asset{i}",
            dt.datetime(2025, 3, 1) + dt.timedelta(hours=(h % 720)),
            f"creator{h % 23}",
            tags_bank[h % len(tags_bank)],
            objs_bank[(h >> 8) % len(objs_bank)],
            [((h >> (j % 24)) % 251) / 251.0 for j in range(16)],
        ))
    return spark.createDataFrame(
        rows,
        "asset_id string, ts timestamp, creator_id string, "
        "tags array<string>, objects array<string>, embedding array<float>",
    )


def visual_trends(assets: DataFrame) -> DataFrame:
    """Tag-level trend stats + membership-rule classification
    (trend_detector.py:177-303 shape): explode tags -> day buckets ->
    velocity/adopters -> arrays_overlap rule cascade."""
    tagged = assets.select(
        "asset_id", "creator_id", "objects",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.explode("tags").alias("tag"),
    )
    daily = tagged.groupBy("tag", "day").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("creator_id").alias("adopters"),
    )
    w = Window.partitionBy("tag").orderBy("day")
    v = daily.withColumn(
        "velocity", F.col("cnt") - F.coalesce(F.lag("cnt").over(w), F.lit(0))
    )
    stats = v.groupBy("tag").agg(
        F.sum("cnt").alias("total"),
        F.max("adopters").alias("peak_adopters"),
        F.round(F.avg("velocity"), 6).alias("avg_velocity"),
    )
    # membership rules over array columns (food_analyzer/visual_analyzer
    # keyword idiom): utensil-heavy tags flagged via arrays_overlap
    utensils = F.array(F.lit("pan"), F.lit("pot"), F.lit("knife"))
    tag_objects = (
        tagged.groupBy("tag").agg(F.flatten(F.collect_set("objects")).alias("objs"))
    )
    return (
        stats.join(tag_objects, "tag")
        .withColumn("uses_utensils", F.arrays_overlap(F.col("objs"), utensils))
        .withColumn(
            "stage",
            F.when(F.col("avg_velocity") > 0.5, "emerging")
            .when(F.col("avg_velocity") < -0.5, "fading")
            .otherwise("steady"),
        )
        .select("tag", "total", "peak_adopters", "avg_velocity", "uses_utensils", "stage")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_number", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload_resized", T.BinaryType()),
    ]
)


def _resize_image_stub(raw: bytes, width: int, height: int) -> bytes:
    """STUB resize — deterministic fake (no image libs in container).
    Real impl: cv2.resize / PIL Image.resize.  The fake is a pure
    function of (payload, target dims) via md5 so the DuckDB oracle can
    recompute it from the raw payload."""
    if not raw:
        raise ValueError("empty image payload")
    tag = f"{width}x{height}"
    return hashlib.md5(raw + tag.encode("ascii")).hexdigest().encode("ascii")


def resize_frames(frames: DataFrame, width: int, height: int) -> DataFrame:
    """frames(asset_id, frame_number, payload) -> resized payloads with
    target dims.  Same mapInPandas shape as extract_frame_features:
    Arrow batches, decoder/encoder init once per partition, purely
    row-parallel — no shuffle at any scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    asset_id,
                    int(frame_number),
                    width,
                    height,
                    _resize_image_stub(
                        bytes(payload) if payload is not None else b"", width, height
                    ),
                )
                for asset_id, frame_number, payload in zip(
                    pdf["asset_id"], pdf["frame_number"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_number", "width", "height", "payload_resized"],
            )

    return frames.select("asset_id", "frame_number", "payload").mapInPandas(
        run, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Food / visual analyzer keyword banks (SURVEY.md M7; reference
# food_analyzer.py:10-90 + visual_analyzer.py:100-124).  The reference's
# analyzers are keyword-on-path mocks; their rule tables are ported
# 1:1 as codegen'd when/contains cascades (first-match semantics kept —
# `elif` order matters: a "grilled cake" path is cake-ingredients +
# grilling + indulgent, test_food_analyzer.py:15-28).
# ---------------------------------------------------------------------------

def _contains(col: Column, kw: str) -> Column:
    return F.contains(col, F.lit(kw))


def food_analysis(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Columnar port of FoodAnalyzer over a path/description column:
    adds ingredients, cooking_technique, plating_style,
    nutritional_trends, cuisine (food_analyzer.py:10-90 rule-for-rule).
    Pure string expressions — whole-stage codegen, no UDF."""
    p = F.col(path_col)
    ingredients = (
        F.when(_contains(p, "salad"), F.array(F.lit("lettuce"), F.lit("tomato"), F.lit("cucumber")))
        .when(_contains(p, "cake"), F.array(F.lit("flour"), F.lit("sugar"), F.lit("chocolate")))
        .otherwise(F.array(F.lit("unknown_ingredient_1"), F.lit("unknown_ingredient_2")))
    )
    technique = (
        F.when(_contains(p, "grill"), "grilling")
        .when(_contains(p, "fry"), "frying")
        .otherwise("unknown_technique")
    )
    plating = (
        F.when(_contains(p, "fancy"), "artistic")
        .when(_contains(p, "simple"), "minimalist")
        .otherwise("unknown_style")
    )
    nutritional = (
        F.when(
            _contains(p, "healthy") | _contains(p, "salad"),
            F.array(F.lit("healthy"), F.lit("low-calorie")),
        )
        .when(
            _contains(p, "indulgent") | _contains(p, "cake"),
            F.array(F.lit("indulgent"), F.lit("high-calorie")),
        )
        .otherwise(F.array(F.lit("balanced")))
    )
    cuisine = (
        F.when(_contains(p, "italian") | _contains(p, "pasta"), "Italian")
        .when(_contains(p, "mexican") | _contains(p, "taco"), "Mexican")
        .otherwise("Unknown Cuisine")
    )
    return df.withColumns(
        {
            "ingredients": ingredients,
            "cooking_technique": technique,
            "plating_style": plating,
            "nutritional_trends": nutritional,
            "cuisine": cuisine,
        }
    )


# FoodAnalyzer.define_food_trend_taxonomy (food_analyzer.py:56-70) — the
# fixed taxonomy, exposed as a constant (it is config, not computation).
FOOD_TREND_TAXONOMY = {
    "categories": ["ingredients", "diets", "cuisine_types", "presentation"],
    "trends": {
        "ingredients": ["plant-based", "fermented", "local_seasonal"],
        "diets": ["vegan", "keto", "gluten-free"],
        "cuisine_types": ["fusion", "street_food", "comfort_food_revamped"],
        "presentation": ["deconstructed", "rustic_charcuterie", "bowl_food"],
    },
}
