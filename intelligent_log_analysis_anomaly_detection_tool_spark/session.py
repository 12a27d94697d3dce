"""SparkSession factory tuned for this engine.

Pins UTC (the reference parses timestamps through ``mktime`` which is
localtime-dependent, /root/reference/src/utils/TimeUtils.cpp:73-112; we pin
UTC everywhere and generate fixtures in UTC so semantics are reproducible),
enables AQE + skew-join handling (hot conversations are a first-class skew
concern at scale), and Arrow for the pandas-UDF parse stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "log-transcript-pipeline",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard configs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` and let spark-submit supply the master. On a
    1000-executor cluster the same conf applies; only shuffle_partitions
    should scale with total cores (AQE coalesces the excess at runtime).
    """
    os.environ.setdefault("TZ", "UTC")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(cpus) if cpus.isdigit() else 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for pandas UDFs (the parse stage is Arrow-batched).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # Generous driver memory for local[32] runs on the 128 GiB box.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local"):
        # Input split sizing is env-tunable for scan-parallelism experiments.
        # Round-3 finding (BENCH.md): small splits (4 MB) lift ISOLATED
        # sequential stage efficiency at local[8] (parse 0.61 -> 0.78 on a
        # 10-partition input) but measurably HURT the real concurrent DAG —
        # mildly at local[8], catastrophically at local[32] (61 s -> 139 s)
        # — because concurrent branch submission already fills the slots
        # that small splits were trying to fill, while many small python
        # stages multiply per-task overhead. The default therefore stays at
        # Spark's 128 MB; override only for single-stage studies.
        builder = (
            builder.config(
                "spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
            ).config(
                "spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "4194304"),
            )
        )
    # shuffle scratch on tmpfs when available: local-mode shuffles otherwise
    # contend on the (virtual) disk and cap multi-core scaling
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
