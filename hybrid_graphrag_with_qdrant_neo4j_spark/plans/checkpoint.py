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


# ---------------------------------------------------------------------------
# Iceberg probe (VERDICT r2 next-round #8): when the cluster classpath has
# the Iceberg runtime AND a catalog is configured, stage snapshots are
# Iceberg tables (createOrReplace = atomic snapshot commit) and the
# manifest records the snapshot id; otherwise plain parquet with identical
# schemas and identical resume semantics.  This runtime has no Iceberg
# jars, so the parquet path is what CI exercises; the Iceberg test is
# import-skipped.
# ---------------------------------------------------------------------------

def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def iceberg_catalog(spark: SparkSession) -> Optional[str]:
    """Name of a configured Iceberg catalog (spark.sql.catalog.<name> =
    org.apache.iceberg.spark.SparkCatalog), or None.

    Probes the RUNTIME SQL conf first (``SET`` lists every explicitly-set
    SQL conf, including ``spark.conf.set`` calls made after session
    start — ADVICE r3: ``sparkContext.getConf()`` only reflects
    context-creation configs), then falls back to the static SparkConf."""
    if not iceberg_available(spark):
        return None
    pairs: list = []
    try:
        pairs.extend((r[0], r[1]) for r in spark.sql("SET").collect())
    except Exception:
        pass
    pairs.extend(spark.sparkContext.getConf().getAll())
    for k, v in pairs:
        if (
            k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in str(v).lower()
        ):
            return k.rsplit(".", 1)[1]
    return None


def _iceberg_table_name(catalog: str, namespace: str, stage: str) -> str:
    safe = "".join(c if c.isalnum() or c == "_" else "_" for c in stage)
    return f"{catalog}.{namespace}.{safe}"


def _latest_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row[0]) if row else None
    except Exception:
        return None


@dataclass
class StageResult:
    df: DataFrame
    resumed: bool
    manifest: dict


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, MANIFEST_NAME)


def _data_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, "data")


def amend_manifest(out_dir: str, stage: str, extra: dict) -> None:
    """Atomically merge ``extra`` into a completed stage's manifest —
    for stage-specific metadata (e.g. seed-selection params) the
    generic :func:`run_stage` writer doesn't know about.  No-op when
    the stage has no manifest (never completed)."""
    man = load_manifest(out_dir, stage)
    if man is None:
        return
    man.update(extra)
    tmp = _manifest_path(out_dir, stage) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(man, fh, indent=2)
    os.replace(tmp, _manifest_path(out_dir, stage))


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
    partition_by: Optional[list] = None,
) -> StageResult:
    """Compute-or-resume one pipeline stage.

    The manifest is written only *after* the data commit succeeds, so a
    kill mid-write leaves no manifest and the stage recomputes —
    exactly-once snapshot semantics without a transaction log.  When an
    Iceberg catalog is configured (see :func:`iceberg_catalog`) the
    snapshot is an Iceberg table committed via
    ``writeTo(...).createOrReplace()`` and the manifest records the
    snapshot id; resume reads the table back by name.
    """
    manifest = load_manifest(out_dir, stage)
    data_path = _data_path(out_dir, stage)
    if manifest is not None and manifest.get("fingerprint") == fingerprint:
        if manifest.get("iceberg_table"):
            # resume fallback (ADVICE r3): a manifest recording an
            # Iceberg table may be read back in a session whose catalog
            # is no longer configured — fall back to the parquet
            # data_path when present, else recompute (fall through)
            try:
                df = spark.read.table(manifest["iceberg_table"])
                return StageResult(df=df, resumed=True, manifest=manifest)
            except Exception:
                if os.path.isdir(data_path):
                    df = spark.read.parquet(data_path)
                    return StageResult(df=df, resumed=True, manifest=manifest)
        else:
            df = spark.read.parquet(data_path)
            return StageResult(df=df, resumed=True, manifest=manifest)

    df = compute()
    if repartition:
        df = df.repartition(repartition)
    catalog = iceberg_catalog(spark)
    extra: dict = {}
    if catalog:
        namespace = os.environ.get("SPARK_GRAFT_ICEBERG_NS", "default")
        table = _iceberg_table_name(catalog, namespace, stage)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        writer = df.writeTo(table)
        if partition_by:
            from pyspark.sql import functions as _F

            writer = writer.partitionedBy(*[_F.col(c) for c in partition_by])
        writer.createOrReplace()
        out = spark.read.table(table)
        extra = {"iceberg_table": table, "snapshot_id": _latest_snapshot_id(spark, table)}
    else:
        w = df.write.mode("overwrite")
        if partition_by:
            # physical layout key (e.g. lang): downstream stages that
            # filter on it get partition PRUNING — at 10^12 docs the
            # en-only NER/triple stages never open non-en files
            # (north_star "language-filtered partitions")
            w = w.partitionBy(*partition_by)
        w.parquet(data_path)
        out = spark.read.parquet(data_path)
    n_rows = out.count()
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "n_rows": n_rows,
        "n_partitions": out.rdd.getNumPartitions(),
        "schema": out.schema.simpleString(),
        "completed_at_unix": int(time.time()),
        **extra,
    }
    os.makedirs(os.path.dirname(_manifest_path(out_dir, stage)), exist_ok=True)
    tmp = _manifest_path(out_dir, stage) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, _manifest_path(out_dir, stage))
    return StageResult(df=out, resumed=False, manifest=manifest)
