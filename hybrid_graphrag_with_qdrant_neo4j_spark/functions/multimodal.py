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

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

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
    the way a real decoder errors on truncated bytes."""
    if not raw:
        raise ValueError("empty image payload")
    h = zlib.crc32(raw)
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
