"""Per-stage checkpoint manifests + resume (SURVEY.md §4 custom work #4,
north-rule "resumable from checkpoint with per-partition lineage +
metrics").

Each pipeline stage writes its output parquet snapshot plus a
``_manifest.json`` recording the stage name, an input fingerprint, row
count, partition count and schema.  On restart, a stage whose manifest
matches the requested fingerprint is *read back instead of recomputed* —
a killed run resumes from the last completed snapshot.  This is batch
checkpointing (the reference has no streaming; SURVEY.md §1.3/§2.10).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"


@dataclass
class StageResult:
    df: DataFrame
    resumed: bool
    manifest: dict


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, MANIFEST_NAME)


def _data_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, "data")


def load_manifest(out_dir: str, stage: str) -> Optional[dict]:
    path = _manifest_path(out_dir, stage)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "r", encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def run_stage(
    spark: SparkSession,
    out_dir: str,
    stage: str,
    fingerprint: str,
    compute: Callable[[], DataFrame],
    repartition: Optional[int] = None,
) -> StageResult:
    """Compute-or-resume one pipeline stage.

    The manifest is written only *after* the parquet commit succeeds, so
    a kill mid-write leaves no manifest and the stage recomputes —
    exactly-once snapshot semantics without a transaction log.  (With
    Iceberg jars on the cluster this becomes ``writeTo(...).createOrReplace``
    and the snapshot id goes in the manifest instead.)
    """
    manifest = load_manifest(out_dir, stage)
    data_path = _data_path(out_dir, stage)
    if manifest is not None and manifest.get("fingerprint") == fingerprint:
        df = spark.read.parquet(data_path)
        return StageResult(df=df, resumed=True, manifest=manifest)

    df = compute()
    if repartition:
        df = df.repartition(repartition)
    df.write.mode("overwrite").parquet(data_path)
    out = spark.read.parquet(data_path)
    n_rows = out.count()
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "n_rows": n_rows,
        "n_partitions": out.rdd.getNumPartitions(),
        "schema": out.schema.simpleString(),
        "completed_at_unix": int(time.time()),
    }
    os.makedirs(os.path.dirname(_manifest_path(out_dir, stage)), exist_ok=True)
    tmp = _manifest_path(out_dir, stage) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, _manifest_path(out_dir, stage))
    return StageResult(df=out, resumed=False, manifest=manifest)
