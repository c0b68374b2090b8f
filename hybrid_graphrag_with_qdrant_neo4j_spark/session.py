"""SparkSession factory.

Local-mode testing (local[N]) stands in for a multi-executor cluster; all
configs below are the ones that matter at real cluster scale too: AQE
(runtime re-plan + skew-join splitting), sane shuffle partition counts,
Arrow for the pandas-UDF hot path.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hybrid_graphrag_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism in local mode; a real cluster would set this
        # to ~2-3x total cores (or rely on AQE coalescing from a high cap)
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 4096, not 10000: UDFs returning wide arrays (term_chunk_edges
        # emits ~600 structs/chunk) make a 10k-record Arrow batch tens of
        # MB; at N concurrent tasks that blows netty's direct-memory pool
        # (observed OutOfDirectMemoryError at 200k pages x local[24] with
        # the 1 GiB default)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Arrow IPC buffers live in netty direct memory, whose JVM
        # default (= -Xmx or 1 GiB cap in some distros) is far too small
        # for many concurrent Arrow UDF stages — size it explicitly
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:MaxDirectMemorySize="
            + os.environ.get("SPARK_GRAFT_DIRECT_MEM", "8g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # python workers over unix domain sockets: avoids intermittent
        # ~63s TCP SYN-retry stalls observed on this host when a worker
        # pool spins up (8 tasks all blocked exactly 67.8s, the classic
        # 1+2+4+8+16+32s loopback SYN backoff signature)
        .config("spark.python.unix.domain.socket.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # builder-time JVM options only take effect when THIS process launches
    # the JVM (plain `python bench.py`).  Under spark-submit the driver JVM
    # already exists, so -XX:MaxDirectMemorySize set above is silently
    # ignored — the deploy recipe must pass --driver-java-options instead
    # (see .claude/skills/verify/SKILL.md).  Warn rather than fail: the
    # 4096 Arrow batch cap still applies and covers small runs.
    # PYSPARK_GATEWAY_PORT is set when the JVM launched this python
    # process (spark-submit); an already-active session means the same.
    jvm_preexisting = (
        os.environ.get("PYSPARK_GATEWAY_PORT") is not None
        or SparkSession.getActiveSession() is not None
    )
    spark = builder.getOrCreate()
    if jvm_preexisting:
        # the session conf would show our builder value even though the
        # live JVM ignored it — ask the JVM for its REAL launch arguments
        try:
            jvm_args = list(
                spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean().getInputArguments()
            )
        except Exception:
            jvm_args = []
        if not any("MaxDirectMemorySize" in a for a in jvm_args):
            import warnings

            warnings.warn(
                "driver JVM was launched outside this process without "
                "-XX:MaxDirectMemorySize; the builder-time setting in "
                "session.get_spark() does not apply.  Pass "
                "--driver-java-options '-XX:MaxDirectMemorySize=8g' to "
                "spark-submit for 200k+ page runs.",
                stacklevel=2,
            )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, partitions: int | None = None) -> None:
    """Spin up the python-worker pool once with a trivial pandas UDF so
    worker-creation cost (and any socket flakiness) lands here instead of
    in the first measured UDF stage.  Workers stay warm via reuse."""
    from pyspark.sql import functions as F, types as T

    n = partitions or spark.sparkContext.defaultParallelism

    # type hints must resolve from module globals (PEP 563 strings) —
    # hence the module-level pandas import below, not a local one
    @F.pandas_udf(T.LongType())
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(n * 10, numPartitions=n).select(_noop("id")).count()
